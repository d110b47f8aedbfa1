"""Generate golden trajectory fixtures from the REFERENCE dflex engine (CPU).

Runs the reference NVlabs/DiffRL dflex simulator (CPU-compiled kernels) on a
set of hand-built scenes and records per-step (joint_q, joint_qd[,
particle_q/qd]) trajectories to tests/fixtures/*.npz. tests/test_parity.py
rebuilds the SAME scenes with diffrl_tpu and checks trajectory agreement —
the BASELINE.json "matched trajectories under fixed seed" north star.

Usage (requires a writable copy of the reference dflex, python>=3.12 needs
the compat patches this repo's README documents):

    python tools/gen_parity_fixtures.py --dflex /tmp/dflex_ref

The fixture scenes are defined in tests/parity_scenes.py, shared between
this generator (reference side) and the parity test (diffrl_tpu side).
"""

import argparse
import os
import sys

import numpy as np

# host-side work only: never let the diffrl_tpu imports grab the TPU (a
# concurrent TPU client interferes with any running job — axon gotcha)
import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from parity_scenes import ENV_SCENES, SCENES, _env_builder, builder_spec  # noqa: E402


def replay_spec_into_reference(df, spec):
    """Assign a serialized diffrl_tpu builder into a reference ModelBuilder
    (both keep the same list-field layout; transforms are re-wrapped)."""
    import numpy as np

    b = df.sim.ModelBuilder()
    b.articulation_start = [0]
    for k in ("joint_type", "joint_parent", "joint_q_start", "joint_qd_start",
              "joint_armature", "joint_target_ke", "joint_target_kd",
              "joint_limit_ke", "joint_limit_kd", "joint_target",
              "joint_limit_lower", "joint_limit_upper", "joint_q", "joint_qd",
              "body_mass", "shape_body", "shape_geo_type"):
        setattr(b, k, list(spec[k]))
    b.joint_axis = [np.array(a) for a in spec["joint_axis"]]
    b.joint_X_pj = [
        df.transform(tuple(t[0:3]), tuple(t[3:7])) for t in spec["joint_X_pj"]
    ]
    b.body_inertia = [np.array(i).reshape(3, 3) for i in spec["body_inertia"]]
    b.body_com = [np.array(c) for c in spec["body_com"]]
    b.shape_transform = [
        df.transform(tuple(t[0:3]), tuple(t[3:7])) for t in spec["shape_transform"]
    ]
    b.shape_geo_scale = [tuple(s) for s in spec["shape_geo_scale"]]
    b.shape_geo_src = [None] * len(spec["shape_body"])
    b.shape_materials = [tuple(m) for m in spec["shape_materials"]]
    for m in spec.get("muscles", []):
        b.add_muscle([int(l) for l in m["links"]],
                     [np.array(p) for p in m["points"]],
                     *m["params"])
    return b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dflex", type=str, default="/tmp/dflex_ref",
                    help="path to a writable reference dflex checkout")
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "tests", "fixtures"))
    args = ap.parse_args()

    sys.path.insert(0, args.dflex)
    import dflex as df
    import dflex.config

    dflex.config.no_grad = True  # in-place stepping, no tape

    os.makedirs(args.out, exist_ok=True)

    def T(pos, quat):
        return df.transform(tuple(pos), tuple(quat))

    all_scenes = dict(SCENES)
    for name, sc in ENV_SCENES.items():
        all_scenes[name] = dict(sc, env_scene=True)

    for name, scene in all_scenes.items():
        if scene.get("env_scene"):
            our_builder, joint_act, mus_act = _env_builder(scene["env"])
            builder = replay_spec_into_reference(df, builder_spec(our_builder))
            spec = {"joint_act": joint_act}
            if mus_act is not None:
                spec["muscle_activation"] = mus_act
        else:
            builder = df.sim.ModelBuilder()
            spec = scene["build"](builder, T)
        model = builder.finalize("cpu")
        model.ground = scene.get("ground", False)
        for k, v in scene.get("materials", {}).items():
            setattr(model, k, v)
        if spec and "muscle_activation" in spec:
            import torch

            model.muscle_activation = torch.tensor(
                spec["muscle_activation"], dtype=torch.float32
            )
        state = model.state()
        # detach everything: fixtures run the reference's no_grad path
        import torch

        for attr, val in list(vars(state).items()):
            if isinstance(val, torch.Tensor):
                setattr(state, attr, val.detach())
        if spec and "joint_act" in spec:
            state.joint_act = torch.tensor(
                np.asarray(spec["joint_act"]), dtype=torch.float32
            )
        model.collide(state)

        integrator = df.sim.SemiImplicitIntegrator()
        dt = scene.get("dt", 1.0 / 60.0)
        substeps = scene.get("substeps", 4)
        mm_freq = scene.get("mm_freq", substeps)
        steps = scene.get("steps", 60)

        qs, qds, pqs, pqds = [], [], [], []
        for _ in range(steps):
            state = integrator.forward(model, state, dt, substeps, mm_freq)
            if model.link_count:
                qs.append(state.joint_q.detach().numpy().copy())
                qds.append(state.joint_qd.detach().numpy().copy())
            if model.particle_count:
                pqs.append(state.particle_q.detach().numpy().copy())
                pqds.append(state.particle_qd.detach().numpy().copy())

        out = {}
        if qs:
            out["joint_q"] = np.stack(qs)
            out["joint_qd"] = np.stack(qds)
        if pqs:
            out["particle_q"] = np.stack(pqs)
            out["particle_qd"] = np.stack(pqds)
        path = os.path.join(args.out, f"{name}.npz")
        np.savez(path, **out)
        for k, v in out.items():
            assert np.all(np.isfinite(v)), (name, k)
        print(f"{name}: wrote {path} " +
              " ".join(f"{k}{v.shape}" for k, v in out.items()))


if __name__ == "__main__":
    main()
