#!/usr/bin/env python
"""Convert the reference's TorchScript actuator nets to .npz weight files.

The reference ships per-joint torque models as TorchScript
(resources/actuator_nets/unitree_{go1,go2,go2_sim}.pt, architecture
Linear(6,32) -> softsign -> Linear(32,32) -> softsign -> Linear(32,1),
scripts/actuator_net/utils.py:91, loaded at legged_robot.py:1238-1253).
This tool extracts the raw weights into the .npz layout consumed by
wtw_tpu/models/actuator_net.py (w0,b0,w1,b1,w2,b2 with x @ w + b
convention, i.e. torch weights transposed).

    python tools/convert_actuator_net.py \
        /root/reference/resources/actuator_nets/unitree_go1.pt \
        wtw_tpu/models/data/actuator_go1.npz
"""
import argparse
import sys

import numpy as np


def convert(pt_path: str, out_path: str, check: bool = True):
    import torch

    m = torch.jit.load(pt_path, map_location="cpu")
    sd = m.state_dict()
    layers = sorted({int(k.split(".")[0]) for k in sd})
    out = {}
    for i, li in enumerate(layers):
        out[f"w{i}"] = sd[f"{li}.weight"].numpy().T.astype(np.float32)
        out[f"b{i}"] = sd[f"{li}.bias"].numpy().astype(np.float32)
    np.savez(out_path, **out)

    if check:
        # parity: torch forward vs our JAX forward on random inputs
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        sys.path.insert(0, ".")
        from wtw_tpu.models.actuator_net import apply_actuator_net, load_actuator_net

        params = load_actuator_net(out_path)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(12, 6)).astype(np.float32)
        with torch.no_grad():
            ref = m(torch.tensor(x)).numpy().reshape(-1)
        ours = np.asarray(apply_actuator_net(
            params, *[jnp.asarray(x[:, i]) for i in range(6)]))
        err = np.abs(ref - ours).max()
        assert err < 1e-5, f"parity check failed: {err}"
        print(f"parity ok (max err {err:.2e})")
    print(f"{pt_path} -> {out_path}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("pt")
    ap.add_argument("out")
    ap.add_argument("--no-check", action="store_true")
    args = ap.parse_args()
    convert(args.pt, args.out, check=not args.no_check)
