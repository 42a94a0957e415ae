from .operator import *  # noqa
from .profiling import *  # noqa
