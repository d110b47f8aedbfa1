"""Export a trained policy to a StableHLO artifact and serve it.

Deployment counterpart to train_shac.py (the reference stops at torch
checkpoints; see diffrl_tpu/utils/export.py). Two modes:

Export (reads the training YAML for the network shape):
    python examples/serve_policy.py --cfg cfg/shac/ant.yaml \
        --checkpoint logs/.../best_policy.pkl --out ant_policy.shlo

Serve (framework-free artifact; JSON over HTTP, stdlib only):
    python examples/serve_policy.py --serve ant_policy.shlo --port 8080
    curl -X POST localhost:8080/act -d '{"obs": [[0.0, ...]]}'
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    # the axon TPU plugin registers itself regardless of JAX_PLATFORMS;
    # the config update actually pins the platform (tests/conftest.py)
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def do_export(args):
    import yaml

    from diffrl_tpu.utils.export import export_fn, shac_policy_fn

    with open(args.cfg) as f:
        cfg = yaml.safe_load(f)
    policy, obs_dim, act_dim = shac_policy_fn(args.checkpoint, cfg)
    example = np.zeros((1, obs_dim), dtype=np.float32)
    export_fn(policy, (example,), path=args.out)
    print(f"exported policy ({obs_dim} obs -> {act_dim} act) to {args.out}")


def do_serve(args):
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from diffrl_tpu.utils.export import load_exported

    policy = load_exported(args.serve)

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/act":
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            try:
                body = json.loads(self.rfile.read(length))
                obs = np.asarray(body["obs"], dtype=np.float32)
                if obs.ndim == 1:
                    obs = obs[None]
                act = np.asarray(policy(obs))
                payload = json.dumps({"actions": act.tolist()}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
            except Exception as e:  # noqa: BLE001 — serve errors as JSON
                payload = json.dumps({"error": str(e)}).encode()
                self.send_response(400)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

        def log_message(self, *a):
            pass

    server = HTTPServer(("127.0.0.1", args.port), Handler)
    print(f"serving policy on http://127.0.0.1:{args.port}/act")
    server.serve_forever()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", help="training YAML (export mode)")
    ap.add_argument("--checkpoint", help="SHAC/BPTT .pkl checkpoint (export mode)")
    ap.add_argument("--out", default="policy.shlo")
    ap.add_argument("--serve", help="serve an exported .shlo artifact")
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args()

    if args.serve:
        do_serve(args)
    elif args.cfg and args.checkpoint:
        do_export(args)
    else:
        ap.error("either --serve ARTIFACT or --cfg + --checkpoint")


if __name__ == "__main__":
    main()
