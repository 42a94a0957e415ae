from .solve import *  # noqa
from .interpolators import *  # noqa
