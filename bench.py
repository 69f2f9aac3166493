"""symmer-tpu benchmark harness.

Measures the reference's headline operations (symmer README.md:50-54, see
BASELINE.md) on the available JAX backend (TPU under the driver):

  1. non-Clifford rotation of a 1,000-qubit, 100,000-term operator (+cleanup)
  2. squaring a 1,000-qubit, 500-term operator (250k cross terms, +cleanup)
  3. expectation value of a depth-2,000 Clifford circuit on 1,000 qubits
  4. multiplying two 100,000,000-qubit single Pauli terms

Prints ONE JSON line for the headline metric (1) on stdout; the full table
goes to stderr.  vs_baseline is the speedup over the reference's ~1 s laptop
claim for the same operation.
"""
import json
import os
import sys
import time

import numpy as np


def _amortized_time(fn, fetch, K=10):
    """Per-op wall time with RPC/dispatch latency amortised out.

    Some PJRT transports resolve ``block_until_ready`` before remote execution
    completes; only a host fetch truly synchronises.  We therefore time
    [1 run + fetch] and [K runs + single fetch] (executions serialise on the
    device stream) and report the marginal per-op cost.
    """
    fetch(fn())  # warmup/compile
    t0 = time.perf_counter()
    fetch(fn())
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = None
    for _ in range(K):
        out = fn()
    fetch(out)
    tK = time.perf_counter() - t0
    return max((tK - t1) / (K - 1), 1e-9)


def main():
    import jax

    # persistent compilation cache: first run pays the (remote) compiles,
    # subsequent bench invocations start from the cache
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from symmer_tpu.kernels import jx_core

    dev = jax.devices()[0]
    print(f"# backend: {dev.platform} ({dev})", file=sys.stderr)

    results = {}

    # all benchmark data is generated ON DEVICE (uploading ~100 MB of random
    # planes through a PJRT relay would dominate the wall time)
    def rand_bits(key, shape):
        return jax.random.bits(key, shape, dtype=jnp.uint32)

    keys = jax.random.split(jax.random.key(0), 12)

    # ---- 1. non-Clifford rotation: 1,000 qubits x 100,000 terms -----------
    n_qubits, n_terms = 1000, 100_000
    W = 2 * ((n_qubits + 63) // 64)  # u32 words
    x = rand_bits(keys[0], (n_terms, W))
    z = rand_bits(keys[1], (n_terms, W))
    cr = jax.random.normal(keys[2], (n_terms,), jnp.float32)
    ci = jax.random.normal(keys[3], (n_terms,), jnp.float32)
    xr = rand_bits(keys[4], (W,))
    zr = rand_bits(keys[5], (W,))

    @jax.jit
    def rotate_and_cleanup(x, z, cr, ci, xr, zr, angle):
        # fused: the doubled row set never reaches HBM
        return jx_core.rotate_nonclifford_cleanup(
            x, z, cr, ci, xr, zr, angle, x.shape[0], 1e-7
        )

    t_rot = _amortized_time(
        lambda: rotate_and_cleanup(x, z, cr, ci, xr, zr, 0.3),
        lambda out: int(out[4]),
    )
    results["rotate_1000q_100k_terms_ms"] = t_rot * 1e3

    # ---- 2. square a 1,000-qubit, 500-term operator -----------------------
    T2 = 500
    x2, z2 = x[:T2], z[:T2]
    cr2, ci2 = cr[:T2], ci[:T2]

    @jax.jit
    def square_and_cleanup(x, z, cr, ci):
        # fused: the 250k x 32-word product planes never reach HBM
        return jx_core.mul_pairs_cleanup(x, z, cr, ci, x, z, cr, ci, 1e-7)

    t_sq = _amortized_time(
        lambda: square_and_cleanup(x2, z2, cr2, ci2), lambda out: int(out[4])
    )
    results["square_1000q_500_terms_ms"] = t_sq * 1e3

    # ---- 3. Clifford circuit expectation: 1,000 qubits, depth 2,000 -------
    depth = 2000
    n_obs = 100  # observable terms carried through the circuit
    xo_, zo_ = x[:n_obs], z[:n_obs]
    cro_, cio_ = cr[:n_obs], ci[:n_obs]
    rx = rand_bits(keys[6], (depth, W))
    rz = rand_bits(keys[7], (depth, W))
    rm = jax.random.randint(keys[8], (depth,), 0, 4, jnp.int32)

    @jax.jit
    def clifford_expval(x, z, cr, ci, rx, rz, rm):
        x, z, cr, ci = jx_core.clifford_scan(x, z, cr, ci, rx, rz, rm)
        return jx_core.expval_iz_sum(x, cr, ci, x.shape[0])

    t_cl = _amortized_time(
        lambda: clifford_expval(xo_, zo_, cro_, cio_, rx, rz, rm),
        lambda out: float(out[0]),
    )
    results["clifford_1000q_depth2000_ms"] = t_cl * 1e3

    # ---- 4. two 100,000,000-qubit single Pauli terms ----------------------
    Wbig = 2 * ((100_000_000 + 63) // 64)
    xb1 = rand_bits(keys[9], (1, Wbig))
    zb1 = rand_bits(keys[10], (1, Wbig))
    xb2 = rand_bits(keys[11], (1, Wbig))
    zb2 = rand_bits(keys[0], (1, Wbig))
    cb = jnp.ones(1, jnp.float32)
    cz = jnp.zeros(1, jnp.float32)

    # One mul at this size is ~0.3 ms -- at dispatch-noise level for the
    # amortised estimator.  Chain R muls inside one jit with a data
    # dependency (each iteration consumes the previous product, rolled one
    # word so the chain cannot collapse to an alternation), reduce at the
    # end so nothing dead-code-eliminates, and report total / R.
    R_CHAIN = 32

    def _mul_chained(x1, z1, c1r, c1i, x2, z2, c2r, c2i):
        def body(_, carry):
            xc, zc, crc, cic = carry
            xo, zo, cro, cio = jx_core.mul_pairs(xc, zc, crc, cic, x2, z2, c2r, c2i)
            return jnp.roll(xo, 1, axis=1), jnp.roll(zo, 1, axis=1), cro, cio
        xo, zo, cro, cio = jax.lax.fori_loop(0, R_CHAIN, body, (x1, z1, c1r, c1i))
        return (
            jnp.sum(jax.lax.population_count(xo).astype(jnp.int32))
            + jnp.sum(jax.lax.population_count(zo).astype(jnp.int32)),
            cro[0],
            cio[0],
        )

    mul1 = jax.jit(_mul_chained)
    t_big = _amortized_time(
        lambda: mul1(xb1, zb1, cb, cz, xb2, zb2, cb, cz),
        lambda out: int(out[0]),
        K=4,
    )
    results["mul_100M_qubit_single_terms_ms"] = t_big / R_CHAIN * 1e3

    for k, v in results.items():
        baseline_ms = 1000.0  # reference: ~1 s on a laptop for each op
        print(f"# {k}: {v:.2f} ms  (vs 1s baseline: {baseline_ms / v:.1f}x)", file=sys.stderr)

    headline = results["rotate_1000q_100k_terms_ms"]
    print(
        json.dumps(
            {
                "metric": "nonclifford_rotation_1000q_100k_terms",
                "value": round(headline, 3),
                "unit": "ms",
                "vs_baseline": round(1000.0 / headline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
