from rmp_tpu.parallel.mesh import (ENV_AXIS, audit_collectives,  # noqa: F401
                                   make_mesh, make_sharded_rollout,
                                   shard_env_batch)
