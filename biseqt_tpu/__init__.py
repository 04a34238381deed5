"""biseqt_tpu: a TPU-native seed-and-extend sequence similarity framework.

A from-scratch rebuild of the capabilities of the reference bioinformatics
library ``amirkdv/biseqt`` (Word-Blot similar-segment discovery, k-mer/seed
indexing, affine-gap banded alignment, mutation-model simulation), designed
for TPU hardware: packed integer sequences, radix-sorted on-device k-mer
tables, segmented-reduction band statistics, a Pallas anti-diagonal wavefront
DP kernel, and mesh-sharded all-vs-all discovery via jax collectives.
"""

__version__ = "0.1.0"

from . import matrices  # noqa: F401
from . import sequence  # noqa: F401
from . import stochastics  # noqa: F401
from . import pw  # noqa: F401
