from .dimension import *  # noqa
from .grid import *  # noqa
from .basic import *  # noqa
from .constant import *  # noqa
from .dense import *  # noqa
from .equation import *  # noqa
