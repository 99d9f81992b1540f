from rmp_tpu.policies.base import Policy  # noqa: F401
from rmp_tpu.policies.v1 import (collision_avoidance,  # noqa: F401
                                 configuration_space_biasing,
                                 joint_limit_avoidance, target_policy)
from rmp_tpu.policies.v2 import (cspace_biasing, joint_damping,  # noqa: F401
                                 joint_velocity_cap, obstacle_avoidance,
                                 target_attractor)
from rmp_tpu.policies.neural import (mlp_init, neural_attractor)  # noqa: F401
