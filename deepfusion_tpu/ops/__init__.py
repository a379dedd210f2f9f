from . import layout, ref, requant  # noqa: F401
from .concat import concat  # noqa: F401
from .conv import ConvOp, conv  # noqa: F401
