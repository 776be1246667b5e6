from . import context, param, rng
