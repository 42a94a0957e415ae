from .differentiable import *  # noqa
from .derivative import *  # noqa
from .tools import *  # noqa
