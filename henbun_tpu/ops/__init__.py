from . import linalg
from .linalg import eye, clip, log_sum_exp, vec_to_tri, tri_to_vec, matmul_hp
from . import pallas_mlp, pallas_sample
