from .distributor import *  # noqa
