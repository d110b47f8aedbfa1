"""Scene definitions shared by the reference-engine fixture generator
(tools/gen_parity_fixtures.py) and the parity test (tests/test_parity.py).

Each build function receives (builder, T) where ``builder`` is either the
reference dflex ModelBuilder or the diffrl_tpu ModelBuilder (same method
surface) and ``T(pos, quat)`` constructs a joint transform in whichever
format that builder expects. Joint-type constants are the shared ints
(PRISMATIC=0, REVOLUTE=1, BALL=2, FIXED=3, FREE=4).
"""

import math

import numpy as np

PRISMATIC, REVOLUTE, BALL, FIXED, FREE = 0, 1, 2, 3, 4
QI = (0.0, 0.0, 0.0, 1.0)


def _pendulum2(b, T):
    b.add_articulation()
    l0 = b.add_link(-1, T((0.0, 2.0, 0.0), QI), axis=(0.0, 0.0, 1.0),
                    type=REVOLUTE)
    b.add_shape_box(l0, pos=(0.25, 0.0, 0.0), hx=0.25, hy=0.05, hz=0.05,
                    density=1000.0)
    l1 = b.add_link(l0, T((0.5, 0.0, 0.0), QI), axis=(0.0, 0.0, 1.0),
                    type=REVOLUTE)
    b.add_shape_box(l1, pos=(0.25, 0.0, 0.0), hx=0.25, hy=0.05, hz=0.05,
                    density=1000.0)
    b.joint_q[0] = 0.6
    b.joint_q[1] = -0.4
    return {}


def _cartpole(b, T):
    b.add_articulation()
    cart = b.add_link(-1, T((0.0, 2.0, 0.0), QI), axis=(1.0, 0.0, 0.0),
                      type=PRISMATIC, limit_lower=-4.0, limit_upper=4.0)
    b.add_shape_box(cart, hx=0.25, hy=0.1, hz=0.1, density=1000.0)
    pole = b.add_link(cart, T((0.0, 0.0, 0.0), QI), axis=(0.0, 0.0, 1.0),
                      type=REVOLUTE, damping=0.01)
    b.add_shape_box(pole, pos=(0.0, 0.5, 0.0), hx=0.02, hy=0.5, hz=0.02,
                    density=500.0)
    b.joint_q[1] = 0.3
    return {}


def _ball_joint(b, T):
    b.add_articulation()
    l0 = b.add_link(-1, T((0.0, 1.5, 0.0), QI), axis=(0.0, 0.0, 0.0),
                    type=BALL)
    b.add_shape_box(l0, pos=(0.3, -0.1, 0.1), hx=0.2, hy=0.05, hz=0.1,
                    density=800.0)
    # small initial rotation about a skew axis
    axis = np.array([1.0, 0.0, 0.5]) / np.linalg.norm([1.0, 0.0, 0.5])
    half = 0.4 / 2
    b.joint_q[0:4] = [axis[0] * math.sin(half), axis[1] * math.sin(half),
                      axis[2] * math.sin(half), math.cos(half)]
    return {}


def _freefall_box(b, T):
    b.add_articulation()
    l0 = b.add_link(-1, T((0.0, 0.0, 0.0), QI), axis=(0.0, 0.0, 0.0),
                    type=FREE)
    b.add_shape_box(l0, hx=0.25, hy=0.1, hz=0.15, density=100.0,
                    ke=1.0e4, kd=1000.0, kf=500.0, mu=0.5)
    half = 0.3 / 2
    b.joint_q[0:3] = [0.0, 0.6, 0.0]
    b.joint_q[3:7] = [math.sin(half), 0.0, 0.0, math.cos(half)]
    return {}


def _muscle_pendulum(b, T):
    b.add_articulation()
    l0 = b.add_link(-1, T((0.0, 2.0, 0.0), QI), axis=(0.0, 0.0, 1.0),
                    type=REVOLUTE)
    b.add_shape_box(l0, pos=(0.25, 0.0, 0.0), hx=0.25, hy=0.05, hz=0.05,
                    density=1000.0)
    l1 = b.add_link(l0, T((0.5, 0.0, 0.0), QI), axis=(0.0, 0.0, 1.0),
                    type=REVOLUTE)
    b.add_shape_box(l1, pos=(0.25, 0.0, 0.0), hx=0.25, hy=0.05, hz=0.05,
                    density=1000.0)
    b.add_muscle([l0, l0, l1], [(0.05, 0.1, 0.0), (0.45, 0.1, 0.0),
                                (0.3, 0.05, 0.0)],
                 f0=50.0, lm=0.5, lt=0.1, lmax=0.7, pen=0.0)
    b.joint_q[0] = 0.2
    return {"muscle_activation": [30.0]}


def _spring_particles(b, T):
    b.add_particle((0.0, 1.0, 0.0), (0.0, 0.0, 0.0), 0.0)   # pinned
    b.add_particle((0.7, 1.0, 0.0), (0.0, 0.0, 0.0), 1.0)
    b.add_spring(0, 1, ke=50.0, kd=1.0, control=0.0)
    return {}


def _particle_ground(b, T):
    b.add_particle((0.1, 0.4, -0.05), (0.5, 0.0, 0.2), 1.0)
    return {}


def _arm7(b, T):
    """7-dof fixed-base serial arm with PD joint targets and limits — the
    franka/allegro-style articulated-arm rig (reference
    dflex/tests/test_franka.py analog, procedurally built)."""
    b.add_articulation()
    axes = [(0.0, 0.0, 1.0), (0.0, 1.0, 0.0), (1.0, 0.0, 0.0),
            (0.0, 1.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0),
            (0.0, 0.0, 1.0)]
    parent = -1
    for i, ax in enumerate(axes):
        offset = (0.0, 1.2, 0.0) if i == 0 else (0.3, 0.0, 0.0)
        parent = b.add_link(
            parent, T(offset, QI), axis=ax, type=REVOLUTE,
            limit_lower=-1.8, limit_upper=1.8, limit_ke=200.0, limit_kd=5.0,
            stiffness=30.0, damping=2.0, armature=0.02,
        )
        b.add_shape_capsule(parent, pos=(0.15, 0.0, 0.0), radius=0.05,
                            half_width=0.15, density=800.0)
    # bent start pose + offset PD targets drive a smooth reaching motion
    for i in range(7):
        b.joint_q[i] = 0.25 * ((-1) ** i)
        b.joint_target[i] = 0.6 * ((-1) ** (i + 1))
    return {}


def _fem_block(b, T):
    """Soft FEM grid dropped on the ground (reference test_fem_contact
    analog): tets + surface triangles + particle-ground contact."""
    b.add_soft_grid(
        pos=(0.0, 0.4, 0.0), rot=QI, vel=(0.0, 0.0, 0.0),
        dim_x=2, dim_y=2, dim_z=2, cell_x=0.1, cell_y=0.1, cell_z=0.1,
        density=100.0, k_mu=1000.0, k_lambda=1000.0, k_damp=5.0,
    )
    return {}


SCENES = {
    "pendulum2": dict(build=_pendulum2, ground=False, dt=1.0 / 60.0,
                      substeps=4, mm_freq=4, steps=90),
    "pendulum2_mm1": dict(build=_pendulum2, ground=False, dt=1.0 / 60.0,
                          substeps=4, mm_freq=1, steps=60),
    "cartpole": dict(build=_cartpole, ground=False, dt=1.0 / 60.0,
                     substeps=4, mm_freq=4, steps=90),
    "ball_joint": dict(build=_ball_joint, ground=False, dt=1.0 / 60.0,
                       substeps=8, mm_freq=8, steps=60),
    "freefall_box": dict(build=_freefall_box, ground=True, dt=1.0 / 60.0,
                         substeps=16, mm_freq=16, steps=90),
    "muscle_pendulum": dict(build=_muscle_pendulum, ground=False,
                            dt=1.0 / 60.0, substeps=4, mm_freq=4, steps=60),
    "spring_particles": dict(build=_spring_particles, ground=False,
                             dt=1.0 / 60.0, substeps=4, steps=90,
                             materials=dict(contact_ke=1.0e3, contact_kd=0.0,
                                            contact_kf=1.0e3, contact_mu=0.5)),
    "particle_ground": dict(build=_particle_ground, ground=True,
                            dt=1.0 / 60.0, substeps=8, steps=90,
                            materials=dict(contact_ke=1.0e3, contact_kd=0.0,
                                           contact_kf=1.0e3, contact_mu=0.5)),
    "arm7": dict(build=_arm7, ground=False, dt=1.0 / 60.0,
                 substeps=8, mm_freq=8, steps=90),
    "fem_block": dict(build=_fem_block, ground=True, dt=1.0 / 60.0,
                      substeps=16, steps=60,
                      materials=dict(contact_ke=1.0e3, contact_kd=10.0,
                                     contact_kf=100.0, contact_mu=0.5)),
}


# ---------------------------------------------------------------------------
# env-level scenes: models built by diffrl_tpu's asset importers, replayed
# list-by-list into the reference ModelBuilder by the fixture generator
# (both builders keep the same field layout). Validates the MJCF/URDF import
# path and the full env dynamics, not just hand-built scenes.


def builder_spec(b):
    """Serialize a diffrl_tpu ModelBuilder's articulation + shapes."""
    import numpy as _np

    def arr(x):
        return [list(map(float, _np.asarray(v).reshape(-1))) for v in x]

    return dict(
        joint_type=[int(t) for t in b.joint_type],
        joint_parent=[int(p) for p in b.joint_parent],
        joint_X_pj=arr(b.joint_X_pj),
        joint_axis=arr(b.joint_axis),
        joint_q_start=[int(v) for v in b.joint_q_start],
        joint_qd_start=[int(v) for v in b.joint_qd_start],
        joint_armature=[float(v) for v in b.joint_armature],
        joint_target_ke=[float(v) for v in b.joint_target_ke],
        joint_target_kd=[float(v) for v in b.joint_target_kd],
        joint_limit_ke=[float(v) for v in b.joint_limit_ke],
        joint_limit_kd=[float(v) for v in b.joint_limit_kd],
        joint_target=[float(v) for v in b.joint_target],
        joint_limit_lower=[float(v) for v in b.joint_limit_lower],
        joint_limit_upper=[float(v) for v in b.joint_limit_upper],
        joint_q=[float(v) for v in b.joint_q],
        joint_qd=[float(v) for v in b.joint_qd],
        body_mass=[float(v) for v in b.body_mass],
        body_inertia=arr(b.body_inertia),
        body_com=arr(b.body_com),
        shape_body=[int(v) for v in b.shape_body],
        shape_geo_type=[int(v) for v in b.shape_geo_type],
        shape_geo_scale=arr(b.shape_geo_scale),
        shape_materials=arr(b.shape_materials),
        shape_transform=arr(b.shape_transform),
        muscles=[
            dict(
                links=[int(l) for l in
                       b.muscle_links[b.muscle_start[i]:b.muscle_start[i + 1]]]
                if i + 1 < len(b.muscle_start)
                else [int(l) for l in b.muscle_links[b.muscle_start[i]:]],
                points=arr(
                    b.muscle_points[b.muscle_start[i]:b.muscle_start[i + 1]]
                    if i + 1 < len(b.muscle_start)
                    else b.muscle_points[b.muscle_start[i]:]
                ),
                params=[float(v) for v in b.muscle_params[i]],
            )
            for i in range(len(b.muscle_params))
        ],
    )


def _env_builder(env_name):
    """Build the env's single-robot model with diffrl_tpu's importers and
    return (builder, joint_act [D])."""
    import math as _math
    import os as _os

    import numpy as _np

    from diffrl_tpu import envs as _envs
    from diffrl_tpu.sim import ModelBuilder as _MB
    from diffrl_tpu.sim.model import np_quat_from_axis_angle, np_transform

    _assets = _os.path.join(_os.path.dirname(_envs.__file__), "assets")
    b = _MB()
    if env_name == "Ant":
        from diffrl_tpu.sim.importers.mjcf import parse_mjcf

        parse_mjcf(_os.path.join(_assets, "ant.xml"), b, density=1000.0,
                   stiffness=0.0, damping=1.0, contact_ke=4.0e4,
                   contact_kd=1.0e4, contact_kf=3.0e3, contact_mu=0.75,
                   limit_ke=1.0e3, limit_kd=1.0e1, armature=0.05)
        b.joint_q[0:3] = [0.0, 0.75, 0.0]
        b.joint_q[3:7] = list(np_quat_from_axis_angle((1.0, 0.0, 0.0),
                                                      -_math.pi * 0.5))
        b.joint_q[7:15] = [0.0, 1.0, 0.0, -1.0, 0.0, -1.0, 0.0, 1.0]
        b.joint_target[7:15] = [0.0, 1.0, 0.0, -1.0, 0.0, -1.0, 0.0, 1.0]
    elif env_name == "CartPoleSwingUp":
        from diffrl_tpu.sim.importers.urdf import urdf_load

        urdf_load(b, _os.path.join(_assets, "cartpole.urdf"),
                  np_transform((0.0, 2.5, 0.0),
                               np_quat_from_axis_angle((1.0, 0.0, 0.0),
                                                       -_math.pi * 0.5)),
                  floating=False, shape_kd=1.0e4, limit_kd=1.0)
        b.joint_q[1] = -_math.pi
    elif env_name == "Humanoid":
        from diffrl_tpu.sim.importers.mjcf import parse_mjcf

        parse_mjcf(_os.path.join(_assets, "humanoid.xml"), b,
                   stiffness=5.0, damping=0.1, contact_ke=2.0e4,
                   contact_kd=5.0e3, contact_kf=1.0e3, contact_mu=0.75,
                   limit_ke=1.0e3, limit_kd=1.0e1, armature=0.007,
                   load_stiffness=True, load_armature=True)
        b.joint_q[0:3] = [0.0, 1.35, 0.0]
        b.joint_q[3:7] = list(np_quat_from_axis_angle((1.0, 0.0, 0.0),
                                                      -_math.pi * 0.5))
    elif env_name == "SNUHumanoid":
        from diffrl_tpu.envs.snu_humanoid import _FILTER
        from diffrl_tpu.sim.importers.snu import SnuGains, load_snu

        snu_dir = _os.path.join(_assets, "snu")
        loaded = load_snu(
            _os.path.join(snu_dir, "human.xml"),
            _os.path.join(snu_dir, "muscle284.xml"),
            b, include=_FILTER,
            gains=SnuGains(joint_stiffness=5.0, joint_damping=2.0,
                           joint_armature=0.05, limit_ke=1.0e3,
                           limit_kd=1.0e1, shape_ke=5.0e3, shape_kd=2.0e3,
                           shape_kf=1.0e3, shape_mu=0.5),
        )
        b.joint_q[0:3] = [0.0, 1.0, 0.0]
        b.joint_q[3:7] = list(np_quat_from_axis_angle((0.0, 1.0, 0.0),
                                                      _math.pi * 0.5))
        D = len(b.joint_qd)
        act = _np.zeros(D, dtype=_np.float32)
        # constant sub-maximal activations exercise the 152-MTU path
        mus_act = [0.05 * m.peak_force for m in loaded.muscles]
        return b, act, mus_act
    else:
        raise KeyError(env_name)

    D = len(b.joint_qd)
    act = _np.zeros(D, dtype=_np.float32)
    if env_name == "Ant":
        act[6:] = 40.0 * _np.sin(_np.arange(8))       # constant test torques
    elif env_name == "Humanoid":
        act[6:] = 25.0 * _np.sin(_np.arange(D - 6))
    else:
        act[0] = 120.0
    return b, act, None


ENV_SCENES = {
    "env_cartpole_urdf": dict(env="CartPoleSwingUp", ground=False,
                              dt=1.0 / 60.0, substeps=4, mm_freq=4, steps=60),
    "env_ant_mjcf": dict(env="Ant", ground=True, dt=1.0 / 60.0,
                         substeps=16, mm_freq=16, steps=40),
    "env_humanoid_mjcf": dict(env="Humanoid", ground=True, dt=1.0 / 60.0,
                              substeps=48, mm_freq=48, steps=16),
    "env_snu_muscles": dict(env="SNUHumanoid", ground=True, dt=1.0 / 60.0,
                            substeps=48, mm_freq=48, steps=16),
}
