from rmp_tpu.sim import collision, data, dynamics, objects, randomizer, world  # noqa: F401
from rmp_tpu.sim.collision import ObstacleSet  # noqa: F401
from rmp_tpu.sim.objects import (Cylinder, FrankaPanda, Goal, Sphere,  # noqa: F401
                                 TwoJointRobot)
from rmp_tpu.sim.randomizer import SceneRandomizer  # noqa: F401
from rmp_tpu.sim.world import SimState, Simulation, init_state, physics_step, sense  # noqa: F401
