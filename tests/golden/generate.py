"""Generate golden parity fixtures from the reference implementation.

Runs the REFERENCE's TF stack (pybullet stubbed) to record closed-loop
trajectories through our integrator, then saves them as .npz fixtures that
tests/test_golden.py checks WITHOUT needing the reference checkout or TF.

Usage (requires /root/reference): python tests/golden/generate.py
"""
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *2 * [os.pardir]))

REF = "/root/reference"
OUT = os.path.dirname(os.path.abspath(__file__))


def main():
    for name in ("pybullet", "pybullet_data", "imageio"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.path.insert(0, REF)
    import tensorflow as tf
    tf.config.set_visible_devices([], "GPU")
    import kinematics as ref_kin
    import rmp as ref_rmp
    import taskmap as ref_taskmap

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rmp_tpu.models import robots
    from rmp_tpu.sim import dynamics

    # --- franka 01 policy set, 40 control ticks through our integrator -----
    model = robots.franka_panda()
    fkine = ref_kin.UrdfForwardKinematic(
        urdf_filepath=os.path.join(REF, "urdf", "franka_panda", "panda.urdf"),
        order=list(model.motor_names))
    goal = np.array([0.6, 0.0, 0.4], dtype=np.float32)
    chain = ref_taskmap.chain_taskmaps([
        ref_taskmap.TaskmapByForwardKinematic(fkine, robots.PANDA_EE_FRAME),
        ref_taskmap.TaskmapFrom4x4ToPosition()])
    core = ref_rmp.RmpCore(rmps={})
    core.add_rmp(ref_rmp.TargetPolicy(alpha=0.1, beta=0.5, c=0.1, goal=goal,
                                      name="target", taskmap=chain))

    q = robots.PANDA_Q_READY.copy()
    qd = np.zeros_like(q)
    traj_q, traj_qdd = [q.copy()], []
    for _ in range(40):
        qdd = core.evaluate(q, qd).numpy().astype(np.float32)
        traj_qdd.append(qdd.copy())
        for _ in range(10):
            q, qd = (np.asarray(v) for v in dynamics.semi_implicit_euler_step(
                model, jnp.asarray(q), jnp.asarray(qd), jnp.asarray(qdd),
                0.01))
        traj_q.append(q.copy())
    np.savez(os.path.join(OUT, "franka01_trajectory.npz"),
             goal=goal, q=np.stack(traj_q), qdd=np.stack(traj_qdd))
    print("wrote franka01_trajectory.npz",
          np.stack(traj_q).shape, np.stack(traj_qdd).shape)

    # --- two-joint 01 policy set, 40 ticks ---------------------------------
    model2 = robots.two_joint_robot()
    fkine2 = ref_kin.UrdfForwardKinematic(
        urdf_filepath=os.path.join(REF, "urdf",
                                   "TwoJointRobot_wo_fixedJoints.urdf"),
        order=list(model2.motor_names))
    goal2 = np.array([1.4, -1.4, 0.1], dtype=np.float32)
    chain2 = ref_taskmap.chain_taskmaps([
        ref_taskmap.TaskmapByForwardKinematic(fkine2, "link_23"),
        ref_taskmap.TaskmapFrom4x4ToPosition()])
    core2 = ref_rmp.RmpCore(rmps={})
    core2.add_rmp(ref_rmp.TargetPolicy(alpha=0.1, beta=0.5, c=0.1,
                                       goal=goal2, name="target",
                                       taskmap=chain2))
    # non-singular start (the reference's q=0 start crosses the stretched-arm
    # singularity, where pinv cutoffs dominate and trajectories are chaotic)
    q = np.array([0.6, -0.9], dtype=np.float32)
    qd = np.zeros(2, dtype=np.float32)
    traj_q, traj_qdd = [q.copy()], []
    for _ in range(40):
        qdd = core2.evaluate(q, qd).numpy().astype(np.float32)
        traj_qdd.append(qdd.copy())
        for _ in range(10):
            q, qd = (np.asarray(v) for v in dynamics.semi_implicit_euler_step(
                model2, jnp.asarray(q), jnp.asarray(qd), jnp.asarray(qdd),
                0.01))
        traj_q.append(q.copy())
    np.savez(os.path.join(OUT, "two_joint01_trajectory.npz"),
             goal=goal2, q0=np.array([0.6, -0.9], dtype=np.float32),
             q=np.stack(traj_q), qdd=np.stack(traj_qdd))
    print("wrote two_joint01_trajectory.npz",
          np.stack(traj_q).shape, np.stack(traj_qdd).shape)


if __name__ == "__main__":
    main()
