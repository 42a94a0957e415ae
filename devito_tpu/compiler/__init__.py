from .translate import *  # noqa
from .executor import *  # noqa
