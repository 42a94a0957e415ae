"""Typed exception hierarchy.

Reference parity: devito/exceptions.py (CompilationError, InvalidOperator,
InvalidArgument, ExecutionError).
"""


class DevitoTpuError(Exception):
    """Base class for all framework errors."""


class CompilationError(DevitoTpuError):
    """Raised when lowering / JAX compilation of an Operator fails."""


class InvalidOperator(DevitoTpuError):
    """Raised when an Operator cannot be built from the given expressions."""


class InvalidArgument(DevitoTpuError):
    """Raised on bad runtime arguments to ``op.apply``."""


class ExecutionError(DevitoTpuError):
    """Raised on runtime failures (e.g. nan/inf detected by stability checks)."""
