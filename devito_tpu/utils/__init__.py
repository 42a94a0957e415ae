from .tools import *  # noqa
