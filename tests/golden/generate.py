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

    # --- franka 01, TORQUE MODE (VERDICT r2 #6) ----------------------------
    # Same reference TF controller, but the physics routes through the
    # torque-level path the reference actually ran (simulation.py:369-381:
    # calculateInverseDynamics -> TORQUE_CONTROL -> stepSimulation), with
    # PyBullet's loadURDF inertia recomputation applied (plain loadURDF
    # IGNORES the URDF <inertia> tensors — models/urdf.
    # pybullet_collision_inertia). Records per-substep torques (the real
    # observable that moves with the inertia model) plus the closed-loop
    # trajectory, and the exact-accel trajectory for the delta report.
    from rmp_tpu.models.urdf import pybullet_collision_inertia

    model_pb = pybullet_collision_inertia(model)
    q = robots.PANDA_Q_READY.copy()
    qd = np.zeros_like(q)
    traj_q, traj_qdd, traj_tau = [q.copy()], [], []
    for _ in range(40):
        qdd_des = core.evaluate(q, qd).numpy().astype(np.float32)
        traj_qdd.append(qdd_des.copy())
        taus = []
        for _ in range(10):
            tau = dynamics.inverse_dynamics(
                model_pb, jnp.asarray(q), jnp.asarray(qd),
                jnp.asarray(qdd_des))
            tau = jnp.clip(tau, -jnp.asarray(model_pb.effort_limit),
                           jnp.asarray(model_pb.effort_limit))
            taus.append(np.asarray(tau, np.float32))
            qdd_real = dynamics.forward_dynamics(
                model_pb, jnp.asarray(q), jnp.asarray(qd), tau)
            q, qd = (np.asarray(v) for v in dynamics.semi_implicit_euler_step(
                model_pb, jnp.asarray(q), jnp.asarray(qd), qdd_real, 0.01))
        traj_tau.append(np.stack(taus))
        traj_q.append(q.copy())
    exact_q = np.load(os.path.join(OUT, "franka01_trajectory.npz"))["q"]
    delta = float(np.max(np.abs(np.stack(traj_q) - exact_q)))
    np.savez(os.path.join(OUT, "franka01_torque_trajectory.npz"),
             goal=goal, q=np.stack(traj_q), qdd=np.stack(traj_qdd),
             tau=np.stack(traj_tau),
             exact_vs_torque_max_q_delta=np.float32(delta))
    print("wrote franka01_torque_trajectory.npz",
          np.stack(traj_q).shape, np.stack(traj_tau).shape,
          f"exact-vs-torque max|dq|={delta:.2e}")

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

    # --- franka 06 cluttered (the BENCHMARK workload), 50 ticks ------------
    # Reference controller = full v2 stack + c-space bias + per-collision-
    # frame ObstacleAvoidance with per-tick tf.Variable context updates
    # (Datamanager style, data_management.py:22-37); sensing and integration
    # come from our analytic engine on both sides so the fixture isolates
    # CONTROLLER parity (same construction as
    # tests/test_reference_parity.py::test_cluttered_closed_loop_trajectory_parity).
    import dataclasses

    import rmp2 as ref_rmp2

    from rmp_tpu import envs as envs_mod
    from rmp_tpu.sim.world import sense

    env = envs_mod.make("franka/06_cluttered_environment")
    env.on_solved = None
    model6 = env.model
    state0 = env.reset(jax.random.PRNGKey(0))
    goal6 = np.asarray(state0.sim.goal, dtype=np.float32)

    ref_chain6 = ref_taskmap.chain_taskmaps([
        ref_taskmap.TaskmapByForwardKinematic(fkine, "panda_grasptarget_hand"),
        ref_taskmap.TaskmapFrom4x4ToPosition()])
    core6 = ref_rmp.RmpCore(rmps={})
    core6.add_rmp(ref_rmp2.TargetAttractor(
        goal=goal6, accel_p_gain=0.3, accel_d_gain=0.6, accel_norm_eps=0.075,
        metric_alpha_length_scale=0.05, min_metric_alpha=0.03,
        max_metric_scalar=1, min_metric_scalar=0.5,
        proximity_metric_boost_scalar=1.0,
        proximity_metric_boost_length_scale=0.02, taskmap=ref_chain6,
        name="attractor"))
    core6.add_rmp(ref_rmp2.JointVelocityCap(
        max_velocity=0.5, velocity_damping_region=0.15, damping_gain=5.0,
        metric_weight=0.05))
    core6.add_rmp(ref_rmp2.JointDamping(accel_d_gain=1, metric_scalar=0.005,
                                        inertia=0.3))
    core6.add_rmp(ref_rmp2.CSpaceBiasing(
        goal=tf.constant([0.0, -0.9, 0.0, -2.8, 0.0, 2.0,
                          0.7853981633974483, 0.02, 0.02]),
        metric_scalar=0.005, position_gain=1, damping_gain=2,
        robust_position_term_thresh=0.5, inertia=0.0001))
    n_obs = state0.sim.obstacles.count
    frame_vars = {}
    for i in model6.collision_frames:
        frame = model6.frame_names[i]
        v_link = tf.Variable(tf.zeros([n_obs, 3]), trainable=False)
        v_obs = tf.Variable(tf.zeros([n_obs, 3]), trainable=False)
        frame_vars[frame] = (v_link, v_obs)
        tmap = ref_taskmap.chain_taskmaps([
            ref_taskmap.TaskmapByForwardKinematic(fkine, frame),
            ref_taskmap.TaskmapJointFrame4x4ToDistance(
                pos_on_link_in_base_frame=v_link,
                pos_on_obstacle_in_base_frame=v_obs)])
        core6.add_rmp(ref_rmp2.ObstacleAvoidance(
            margin=0.0, damping_gain=50, damping_std_dev=0.04,
            damping_robustness_eps=0.01,
            damping_velocity_gate_length_scale=0.01, repulsion_gain=800,
            repulsion_std_dev=0.01, metric_modulation_radius=0.5,
            metric_scalar=1, metric_exploder_std_dev=0.02,
            metric_exploder_eps=0.001, taskmap=tmap,
            name=f"collision_avoidance_for_{frame}"))

    sim = state0.sim
    traj_q, traj_qdd = [np.asarray(sim.q)], []
    for _ in range(50):
        q6, qd6, ctx = sense(model6, sim)
        for i in model6.collision_frames:
            frame = model6.frame_names[i]
            v_link, v_obs = frame_vars[frame]
            v_link.assign(np.asarray(ctx[frame]["pos_on_link"]))
            v_obs.assign(np.asarray(ctx[frame]["pos_on_obstacle"]))
        qdd6 = core6.evaluate(np.asarray(q6), np.asarray(qd6)).numpy()
        traj_qdd.append(qdd6.astype(np.float32))
        for _ in range(10):
            qn, qdn = dynamics.semi_implicit_euler_step(
                model6, sim.q, sim.qd, jnp.asarray(qdd6), 0.01)
            sim = dataclasses.replace(sim, q=qn, qd=qdn)
        traj_q.append(np.asarray(sim.q))
    np.savez(os.path.join(OUT, "franka06_cluttered_trajectory.npz"),
             goal=goal6, q=np.stack(traj_q), qdd=np.stack(traj_qdd))
    print("wrote franka06_cluttered_trajectory.npz",
          np.stack(traj_q).shape, np.stack(traj_qdd).shape)


if __name__ == "__main__":
    main()
