"""Re-export of the built-in problem generators (lis_tpu.utils.testmat)."""
from lis_tpu.utils.testmat import (tridiag, poisson2d, poisson3d,
                                   poisson3d27, gamma_matrix, random_sparse)
