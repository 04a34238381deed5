"""Device-side ops: k-mer tables, seed joins, segmented stats, DP kernels."""

from . import tables  # noqa: F401
from . import banded_dp  # noqa: F401
