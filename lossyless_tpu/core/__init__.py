from .annealer import Annealer
from .math import BASE_LOG, LOG2, lower_bound, nats_to_bits, ste_round
from .mesh import (DATA_AXIS, data_sharding, init_distributed, make_mesh,
                   replicated, shard_batch)
from .rng import tmp_seed
from .timing import Timer, device_timer

__all__ = [
    "Annealer", "BASE_LOG", "LOG2", "lower_bound", "nats_to_bits",
    "ste_round", "DATA_AXIS", "data_sharding", "init_distributed",
    "make_mesh", "replicated", "shard_batch", "tmp_seed", "Timer",
    "device_timer",
]
