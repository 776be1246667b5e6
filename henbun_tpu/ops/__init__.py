from . import linalg
from .linalg import (
    eye,
    clip,
    log_sum_exp,
    vec_to_tri,
    tri_to_vec,
    fill_triangular,
    fill_triangular_inverse,
    fill_triangular_diag_indices,
    matmul_hp,
)
from . import quadrature
from .quadrature import gauss_hermite_expectation
from . import pallas_chol
