"""Actuator-network training from robot logs.

Re-design of scripts/actuator_net/{train,eval,utils}.py: fit the per-joint
torque model (MLP 6->32->32->1, softsign) on logged
(pos_err, pos_err@t-1, pos_err@t-2, vel, vel@t-1, vel@t-2) -> tau_est pairs
(feature construction utils.py:187-206; Adam lr 8e-4, 100 epochs, batch
128, 80/20 split utils.py:78-146). Export is the .npz consumed by
models/actuator_net.py (and convertible to torch for deployment).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.actuator_net import apply_actuator_net, init_actuator_net


def build_features(joint_pos_target, joint_pos, joint_vel,
                   history_gap: int = 2):
    """Logged (T, nj) arrays -> ((T-2g, nj, 6) features, aligned slices).

    The reference samples t, t-gap, t-2*gap for the two history taps
    (utils.py:187-206 uses consecutive log steps at the 50 Hz control
    rate)."""
    err = joint_pos_target - joint_pos
    g = history_gap
    t0 = slice(2 * g, None)
    t1 = slice(g, -g)
    t2 = slice(None, -2 * g)
    x = np.stack([err[t0], err[t1], err[t2],
                  joint_vel[t0], joint_vel[t1], joint_vel[t2]], axis=-1)
    return x.astype(np.float32)


def train_actuator_network(xs: np.ndarray, ys: np.ndarray, *,
                           lr: float = 8e-4, epochs: int = 100,
                           batch_size: int = 128, seed: int = 0,
                           log_fn=print):
    """xs: (N, 6) features, ys: (N,) measured torques. Returns (params,
    final_test_mae)."""
    xs = jnp.asarray(xs, jnp.float32)
    ys = jnp.asarray(ys, jnp.float32)
    n = xs.shape[0]
    n_train = n // 5 * 4
    key = jax.random.PRNGKey(seed)
    key, k_perm, k_init = jax.random.split(key, 3)
    perm = jax.random.permutation(k_perm, n)
    tr_idx, te_idx = perm[:n_train], perm[n_train:]

    params = init_actuator_net(k_init)
    tx = optax.adam(lr, eps=1e-8)
    opt_state = tx.init(params)

    def net(params, x):
        # apply_actuator_net consumes per-feature columns
        return apply_actuator_net(params, x[:, 0], x[:, 1], x[:, 2],
                                  x[:, 3], x[:, 4], x[:, 5])

    def loss_fn(params, x, y):
        return jnp.mean((net(params, x) - y) ** 2)

    @jax.jit
    def epoch_step(params, opt_state, key):
        key, k = jax.random.split(key)
        order = jax.random.permutation(k, n_train)
        n_batches = n_train // batch_size

        def body(carry, i):
            params, opt_state = carry
            idx = jax.lax.dynamic_slice_in_dim(order, i * batch_size,
                                               batch_size)
            x, y = xs[tr_idx[idx]], ys[tr_idx[idx]]
            loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(n_batches))
        return params, opt_state, key, jnp.mean(losses)

    @jax.jit
    def test_metrics(params):
        pred = net(params, xs[te_idx])
        return (jnp.mean((pred - ys[te_idx]) ** 2),
                jnp.mean(jnp.abs(pred - ys[te_idx])))

    mae = jnp.inf
    for epoch in range(epochs):
        params, opt_state, key, train_loss = epoch_step(params, opt_state,
                                                        key)
        if epoch % 10 == 0 or epoch == epochs - 1:
            test_loss, mae = test_metrics(params)
            log_fn(f"epoch {epoch:3d} | loss {float(train_loss):.4f} | "
                   f"test {float(test_loss):.4f} | mae {float(mae):.4f}")
    return params, float(mae)


def save_actuator_network(params, path: str):
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def _main():
    """CLI analog of scripts/actuator_net/train.py: fit the torque model
    from a log and export the .npz.

        python -m wtw_tpu.learn.actuator_train --log episode.pkl --out net.npz

    The log is a pickle (deploy/logger.py episode format or any dict) with
    (T, 12) arrays: joint_pos_target, joint_pos, joint_vel, tau_est."""
    import argparse
    import pickle

    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True,
                    help="episode .pkl with joint_pos_target/joint_pos/"
                         "joint_vel/tau_est arrays")
    ap.add_argument("--out", default="actuator_net.npz")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    with open(args.log, "rb") as f:
        log = pickle.load(f)
    arrs = {k: np.asarray(log[k], np.float32)
            for k in ("joint_pos_target", "joint_pos", "joint_vel",
                      "tau_est")}
    g = 2
    x = build_features(arrs["joint_pos_target"], arrs["joint_pos"],
                       arrs["joint_vel"], history_gap=g)
    xs = x.reshape(-1, 6)
    ys = arrs["tau_est"][2 * g:].reshape(-1)     # align with the t0 slice
    params, mae = train_actuator_network(xs, ys, epochs=args.epochs,
                                         seed=args.seed)
    save_actuator_network(params, args.out)
    print(f"{args.out}: test MAE {mae:.4f} NM over {len(ys)} samples")


if __name__ == "__main__":
    _main()
