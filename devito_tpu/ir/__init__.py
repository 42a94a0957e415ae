from .lowering import *  # noqa
