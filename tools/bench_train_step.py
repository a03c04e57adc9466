"""On-chip throughput of the compressed-obs TRAINING step at the
north-star shapes (VERDICT r3 #3 / BASELINE.json north star: train and
control through the same BC7 perception path).

Shapes: batch 64 of 64x64 BC7-compressed observations (256 blocks
each), latent-128 / hidden-512 dynamics model, bf16 compute on TPU.

Method: every iteration runs inside ONE jitted fori_loop carrying
(params, opt_state); the input words are perturbed per iteration so
XLA cannot CSE; the loss scalar is fetched to force sync; the rate is
the marginal rate between two iteration counts (cancels the ~20 ms
tunnel dispatch).  Three rows:

  * compressed-obs step (BC7 decode of obs+next_obs in-graph)
  * raw-obs step (same model, pre-decoded uint8 observations)
  * decode-only (just the two decode_obs_batch calls + a reduction)

The decode share of the compressed step is quantified as
(compressed - raw) and cross-checked against decode-only.

Usage: python tools/bench_train_step.py [--batch 64]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/detex_jax_cache")

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402
import numpy as np              # noqa: E402
from jax import lax             # noqa: E402

from detex_tpu.mpc import dynamics as D                    # noqa: E402
from detex_tpu.mpc.runtime import decode_obs_batch         # noqa: E402
from detex_tpu.mpc.train_loop import CorpusReplayEnv       # noqa: E402

# Long-interval method (tools/method_probe.py round 5): >= ~250 ms of
# device work between the two points.
LO, HI = 100, 1100


def marginal_ms(run, *args):
    """run(iters, *args) -> scalar; returns ms/iteration (marginal).

    The scalar is FETCHED (float()) — block_until_ready alone does not
    force a device sync through the axon tunnel's async dispatch."""
    def t(it, pick):
        float(run(jnp.int32(it), *args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(jnp.int32(it), *args))
            ts.append(time.perf_counter() - t0)
        return min(ts) if pick == "min" else sorted(ts)[1]

    return (t(HI, "med") - t(LO, "min")) / (HI - LO) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", default=None,
                    help="LO,HI marginal-rate iteration counts")
    args = ap.parse_args()
    batch_size = args.batch
    global LO, HI
    if args.iters:
        LO, HI = (int(v) for v in args.iters.split(","))

    on_tpu = jax.default_backend() == "tpu"
    dcfg = D.DynamicsConfig(
        image_size=64, latent_dim=128, action_dim=8, hidden_dim=512,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    s = dcfg.image_size
    n_blocks = (s // 4) ** 2

    key = jax.random.PRNGKey(0)
    params = D.init_params(key, dcfg)
    opt = D.make_optimizer()
    opt_state = opt.init(params)

    env = CorpusReplayEnv(dcfg, seed=0)
    rng = np.random.default_rng(0)
    words = jnp.asarray(env._draw_words(rng, batch_size))        # obs
    words2 = jnp.asarray(env._draw_words(rng, batch_size))       # next
    action = jnp.asarray(rng.standard_normal((batch_size, 8)),
                         jnp.float32)
    # Pre-decoded uint8 observations for the raw-obs baseline row.
    obs_raw = jnp.asarray(
        rng.integers(0, 256, (batch_size, s, s, dcfg.channels), np.int64)
        .astype(np.uint8))
    obs_raw2 = jnp.asarray(
        rng.integers(0, 256, (batch_size, s, s, dcfg.channels), np.int64)
        .astype(np.uint8))

    @jax.jit
    def run_compressed(iters, params, opt_state, words, words2, action):
        def body(i, carry):
            p, o = carry
            batch = {
                "obs": decode_obs_batch(words ^ i, s, s),
                "next_obs": decode_obs_batch(words2 ^ i, s, s),
                "action": action,
            }
            p, o, loss = D.train_step(p, o, batch, cfg=dcfg,
                                      optimizer=opt)
            return (p, o)
        p, o = lax.fori_loop(0, iters, body, (params, opt_state))
        return jax.tree.leaves(p)[0].reshape(-1)[0]

    @jax.jit
    def run_raw(iters, params, opt_state, obs, obs2, action):
        def body(i, carry):
            p, o = carry
            batch = {
                "obs": (obs.astype(jnp.int32) + i) & 0xFF,
                "next_obs": (obs2.astype(jnp.int32) + i) & 0xFF,
                "action": action,
            }
            p, o, loss = D.train_step(p, o, batch, cfg=dcfg,
                                      optimizer=opt)
            return (p, o)
        p, o = lax.fori_loop(0, iters, body, (params, opt_state))
        return jax.tree.leaves(p)[0].reshape(-1)[0]

    @jax.jit
    def run_decode_only(iters, words, words2):
        def body(i, acc):
            a = decode_obs_batch(words ^ i, s, s)
            b = decode_obs_batch(words2 ^ i, s, s)
            return acc + a.reshape(-1)[0] + b.reshape(-1)[0]
        return lax.fori_loop(0, iters, body, jnp.int32(0))

    ms_c = marginal_ms(run_compressed, params, opt_state, words, words2,
                       action)
    ms_r = marginal_ms(run_raw, params, opt_state, obs_raw, obs_raw2,
                       action)
    ms_d = marginal_ms(run_decode_only, words, words2)

    blocks_per_step = 2 * batch_size * n_blocks
    print(json.dumps({
        "metric": "compressed_obs_train_step",
        "batch": batch_size,
        "obs": f"{s}x{s} BC7 ({n_blocks} blocks), replay corpus pool",
        "model": f"latent-{dcfg.latent_dim}/hidden-{dcfg.hidden_dim} "
                 f"{'bf16' if on_tpu else 'f32'}",
        "ms_per_step_compressed": round(ms_c, 4),
        "ms_per_step_raw_obs": round(ms_r, 4),
        "steps_per_s": round(1e3 / ms_c, 1),
        "decode_overhead_ms": round(ms_c - ms_r, 4),
        "decode_only_ms": round(ms_d, 4),
        "decode_share_pct": round(100 * (ms_c - ms_r) / ms_c, 1),
        "decode_blocks_per_step": blocks_per_step,
    }))


if __name__ == "__main__":
    main()
