from .ddim import ddim_step, ddim_decode, make_decoder
from .loop import iterative_sampling
