from .chains import chain_mesh, make_sharded_hmc, acceptance_stats
