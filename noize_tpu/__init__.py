"""noize_tpu — TPU-native procedural terrain framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
xshazwar/noize-job (Unity Burst/Jobs).  See SURVEY.md for the layer map of
the reference and README.md for the architecture of this package.
"""

__version__ = "0.1.0"
