from rmp_tpu.models import kinematics, robots, specs, urdf  # noqa: F401
from rmp_tpu.models.urdf import CollisionPrimitive, KinematicModel  # noqa: F401
