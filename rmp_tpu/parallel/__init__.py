from rmp_tpu.parallel.mesh import (ENV_AXIS, make_mesh,  # noqa: F401
                                   make_sharded_rollout, shard_env_batch)
