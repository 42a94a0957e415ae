from .arithmetic import *  # noqa
from .initializers import *  # noqa
