from .dmplug import DMPlugAdamConfig, dmplug_adam, dmplug_lbfgs
from .sf_adamw import SFAdamWState, sf_adamw_init, sf_adamw_step
