"""symmer-tpu benchmark harness.

Measures the reference's headline operations (symmer README.md:50-54, see
BASELINE.md) on the available JAX backend (TPU under the driver):

  1. non-Clifford rotation of a 1,000-qubit, 100,000-term operator (+cleanup)
     -- extended and plain-f32 precision, interleaved, with spread
  2. squaring a 1,000-qubit, 500-term operator (250k cross terms, +cleanup)
  3. expectation value of a depth-2,000 Clifford circuit on 1,000 qubits
  4. multiplying two 100,000,000-qubit single Pauli terms
  5. flagship product flows: Z2-tapering at 100q x 50k (with a per-stage
     breakdown) and 1,000q x 200k terms (default / device-resident / forced
     host paths), and the Be CS-VQE pipeline
  6. a compact on-chip correctness pass (extended precision, device vs the
     packed-numpy host oracle) emitted as the ``check`` field
  7. term-axis scale: 10^6-term rotate+cleanup and 10^6-row cleanup

Prints ONE JSON line for the headline metric (1) on stdout; the full table
goes to stderr.  vs_baseline is the speedup over the reference's ~1 s laptop
claim for the same operation.

``bench.py --check`` instead runs an on-device CORRECTNESS pass: every
production dispatch kernel (cleanup / multiply / rotation sequence /
anticommutation / expval / operator-on-state) executes on the real chip and
is compared against the packed-numpy host oracle at float32-appropriate
tolerances.  Exit code is nonzero on any mismatch.
"""
import json
import os
import sys
import time

import numpy as np


# Partial-result state for the SIGTERM emitter: if the driver's timeout kills
# the bench mid-run (cold compiles through a slow tunnel can take minutes
# each), we still emit ONE JSON line with every section that DID complete --
# a partial TPU record beats an rc=124 artifact with no record at all.
_PARTIAL = {"results": None, "backend": None, "path": None, "emitted": False}


def _install_partial_emitter():
    import signal

    def _on_term(signum, frame):
        res = _PARTIAL["results"]
        if res and not _PARTIAL["emitted"]:
            print(
                f"# SIGTERM/SIGINT ({signum}) -- emitting "
                f"{len(res)} completed metrics",
                file=sys.stderr,
            )
            _emit_headline(
                dict(res), _PARTIAL["backend"], _PARTIAL["path"],
                interrupted=True,
            )
            sys.stdout.flush()
            sys.stderr.flush()
        os._exit(0 if res else 124)

    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, _on_term)


def _install_watchdog(deadline_s=None):
    """Force-emit the partial record if the run wedges past a hard deadline.

    A Python signal handler only runs when the main thread returns to the
    bytecode loop -- a TPU RPC blocked on a congested tunnel therefore
    swallows the driver's SIGTERM and the process hangs until SIGKILL, losing
    every completed metric (observed: a warm-cache run that normally takes
    200 s sat 48 min in one blocked dispatch).  A daemon THREAD is not
    blocked by the main thread's RPC, so it can emit and _exit regardless.
    """
    import threading

    if deadline_s is None:
        deadline_s = float(os.environ.get(
            "SYMMER_BENCH_HARD_DEADLINE_S",
            str(1.8 * float(os.environ.get("SYMMER_BENCH_BUDGET_S", "1500"))),
        ))
    t0 = time.monotonic()

    def _watch():
        while True:
            time.sleep(15)
            if _PARTIAL["emitted"]:
                return
            if time.monotonic() - t0 > deadline_s:
                res = _PARTIAL["results"]
                print(
                    f"# watchdog: {deadline_s:.0f}s hard deadline passed "
                    f"(main thread likely blocked in a device RPC) -- "
                    f"emitting {len(res or ())} completed metrics",
                    file=sys.stderr,
                )
                if res and not _PARTIAL["emitted"]:
                    _PARTIAL["emitted"] = True
                    _emit_headline(
                        dict(res), _PARTIAL["backend"], _PARTIAL["path"],
                        interrupted=True,
                    )
                sys.stdout.flush()
                sys.stderr.flush()
                os._exit(0 if res else 124)

    threading.Thread(target=_watch, daemon=True, name="bench-watchdog").start()


def _section_clock(n_sections):
    """Per-section stderr telemetry + wall-clock budget.

    Returns (done, over_budget): call ``done(name)`` after each section;
    ``over_budget()`` says whether the SYMMER_BENCH_BUDGET_S envelope
    (default 1500 s) is spent, in which case the caller should skip the
    remaining sections and emit what it has."""
    budget = float(os.environ.get("SYMMER_BENCH_BUDGET_S", "1500"))
    t0 = time.perf_counter()
    last = [t0, 0]

    def done(name):
        now = time.perf_counter()
        last[1] += 1
        print(
            f"# [{last[1]}/{n_sections}] {name}: {now - last[0]:.1f}s "
            f"(total {now - t0:.1f}s)",
            file=sys.stderr, flush=True,
        )
        last[0] = now

    def over_budget():
        return time.perf_counter() - t0 > budget

    return done, over_budget


def _amortized_time(fn, fetch, K=10):
    """Per-op wall time with RPC/dispatch latency amortised out.

    Some PJRT transports resolve ``block_until_ready`` before remote execution
    completes; only a host fetch truly synchronises.  We therefore time
    [1 run + fetch] and [K runs + single fetch] (executions serialise on the
    device stream) and report the marginal per-op cost.

    ``fn`` receives the run index and must VARY an input with it (an angle, a
    coefficient scale): the XLA runtime is allowed to cache/elide a repeated
    identical (program, args) execution, which would silently deflate the
    amortised estimate without the kernels changing.
    """
    fetch(fn(0))  # warmup/compile
    t1 = None
    for j in range(2):  # min of two: a single noisy fetch skews the subtraction
        t0 = time.perf_counter()
        fetch(fn(j + 1))
        t = time.perf_counter() - t0
        t1 = t if t1 is None else min(t1, t)
    t0 = time.perf_counter()
    out = None
    for j in range(K):
        out = fn(j + 3)
    fetch(out)
    tK = time.perf_counter() - t0
    return max((tK - t1) / (K - 1), 1e-9)


def _interleaved_amortized(variants, fetch, K=10, rounds=3):
    """Round-robin amortised timing of named variants.

    Measuring variant A's rounds back-to-back and then variant B's exposes
    the A-vs-B comparison to slow drift (background compile-cache writes,
    tunnel congestion): BENCH_r04 recorded plain-f32 rotation SLOWER than the
    strictly-more-arithmetic double-float one.  Interleaving puts every
    variant through the same noise; returns {name: (best_seconds,
    spread_pct)} where spread is (max-min)/min over the rounds.
    """
    samples = {name: [] for name in variants}
    for _ in range(rounds):
        for name, fn in variants.items():
            samples[name].append(_amortized_time(fn, fetch, K))
    out = {}
    for name, ts in samples.items():
        best = min(ts)
        out[name] = (best, (max(ts) - best) / best * 100.0)
    return out


def _honour_platform_env():
    """Re-select the backend named by JAX_PLATFORMS.

    A sitecustomize hook can pre-register an accelerator platform before this
    process ever sees the env var, in which case ``JAX_PLATFORMS=cpu python
    bench.py --fuzz`` would silently run on the accelerator anyway.  Called at
    the top of every bench entry point.
    """
    import jax

    want = os.environ.get("JAX_PLATFORMS", "")
    if not want:
        return
    try:
        if jax.default_backend() != want.split(",")[0]:
            jax.config.update("jax_platforms", want)
            import jax.extend.backend as _jeb

            _jeb.clear_backends()
    except Exception as exc:
        print(f"# warning: could not honour JAX_PLATFORMS={want}: {exc!r}",
              file=sys.stderr)


def main():
    import jax

    # persistent compilation cache: first run pays the (remote) compiles,
    # subsequent bench invocations start from the cache
    from symmer_tpu.config import enable_compile_cache

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    )

    import jax.numpy as jnp

    from symmer_tpu.kernels import jx_core

    dev = jax.devices()[0]
    print(f"# backend: {dev.platform} ({dev})", file=sys.stderr)

    if dev.platform == "cpu":
        # no accelerator: jitted XLA:CPU runs the headline ops BELOW the
        # reference's laptop numbers (round-3 square: 1072 ms = 0.9x); the
        # packed-numpy + native C++ host kernels beat the baseline, so the
        # fallback artifact routes through them instead
        return _host_main()

    results = {}
    spreads = {}  # metric name -> spread_pct over interleaved rounds
    extra = {}  # top-level JSON fields (flagship_breakdown, check, ...)
    _PARTIAL.update(results=results, backend=dev.platform, path="device-xla")
    _install_partial_emitter()
    _install_watchdog()
    section_done, over_budget = _section_clock(7)
    skipped = []

    def finish():
        for k, v in results.items():
            if k.startswith("flagship"):
                print(f"# {k}: {v:.1f} ms", file=sys.stderr)
            else:
                print(
                    f"# {k}: {v:.2f} ms  (vs 1s baseline: {1000.0 / v:.1f}x)",
                    file=sys.stderr,
                )
        if skipped:
            print(f"# budget spent -- skipped sections: {skipped}",
                  file=sys.stderr)
        _emit_headline(results, dev.platform, path="device-xla",
                       skipped=skipped, spreads=spreads, extra=extra)

    def budget_spent(*remaining):
        if over_budget():
            skipped.extend(remaining)
            return True
        return False

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
    cr_f32 = jax.random.normal(keys[2], (n_terms,), jnp.float32)
    ci_f32 = jax.random.normal(keys[3], (n_terms,), jnp.float32)

    def as_df(a):
        # double-float [hi, lo] coefficient planes -- the production default
        # (config.device_precision = 'extended', 1e-10 on-chip energy parity)
        return jnp.stack([a, jnp.zeros_like(a)], axis=-1)

    cr, ci = as_df(cr_f32), as_df(ci_f32)
    xr = rand_bits(keys[4], (W,))
    zr = rand_bits(keys[5], (W,))

    @jax.jit
    def rotate_and_cleanup(x, z, cr, ci, xr, zr, angle):
        # fused: the doubled row set never reaches HBM
        return jx_core.rotate_nonclifford_cleanup(
            x, z, cr, ci, xr, zr, angle, x.shape[0], 1e-7
        )

    # interleaved df/f32 rounds: both variants ride the same transient noise,
    # so the df-vs-f32 delta is attributable to the kernels (BENCH_r04 lesson:
    # back-to-back blocks once recorded f32 SLOWER than extended).  The angle
    # varies per run so XLA can never legally elide a repeated execution.
    rot_timed = _interleaved_amortized(
        {
            "rotate_1000q_100k_terms_ms": lambda j: rotate_and_cleanup(
                x, z, cr, ci, xr, zr, 0.3 + 0.003 * j
            ),
            "rotate_1000q_100k_terms_f32_ms": lambda j: rotate_and_cleanup(
                x, z, cr_f32, ci_f32, xr, zr, 0.3 + 0.003 * j
            ),
        },
        lambda out: int(out[4]),
    )
    for k, (t, spread) in rot_timed.items():
        results[k] = t * 1e3
        spreads[k] = spread
    if (results["rotate_1000q_100k_terms_ms"]
            < results["rotate_1000q_100k_terms_f32_ms"]):
        # df does strictly more arithmetic; faster-than-f32 means the rotate
        # stage is bandwidth/sort-bound at this size (coefficient lanes are a
        # small fraction of the sorted payload) -- flag it rather than let it
        # read as noise
        extra["timing_note"] = (
            "extended<=f32 at this size: sort payload is plane-dominated; "
            f"spreads {spreads['rotate_1000q_100k_terms_ms']:.0f}%/"
            f"{spreads['rotate_1000q_100k_terms_f32_ms']:.0f}%"
        )
    section_done("rotate (df + f32, interleaved)")
    if budget_spent("square", "clifford", "100M-qubit mul", "flagship",
                    "on-chip check", "1M-term scale"):
        return finish()

    # ---- 2. square a 1,000-qubit, 500-term operator -----------------------
    T2 = 500
    x2, z2 = x[:T2], z[:T2]
    cr2, ci2 = cr[:T2], ci[:T2]  # extended [hi, lo] planes

    @jax.jit
    def square_and_cleanup(x, z, cr, ci, s):
        # fused: the 250k x 32-word product planes never reach HBM; ``s``
        # rescales the coefficients so repeated runs are distinct programs
        # from the runtime's point of view (no legal result caching)
        cr = cr * s
        return jx_core.mul_pairs_cleanup(x, z, cr, ci, x, z, cr, ci, 1e-7)

    t_sq = _amortized_time(
        lambda j: square_and_cleanup(x2, z2, cr2, ci2, 1.0 + 0.001 * j),
        lambda out: int(out[4]),
    )
    results["square_1000q_500_terms_ms"] = t_sq * 1e3
    section_done("square")
    if budget_spent("clifford", "100M-qubit mul", "flagship",
                    "on-chip check", "1M-term scale"):
        return finish()

    # ---- 3. Clifford circuit expectation: 1,000 qubits, depth 2,000 -------
    depth = 2000
    n_obs = 100  # observable terms carried through the circuit
    xo_, zo_ = x[:n_obs], z[:n_obs]
    cro_, cio_ = cr[:n_obs], ci[:n_obs]  # extended [hi, lo] planes
    rx = rand_bits(keys[6], (depth, W))
    rz = rand_bits(keys[7], (depth, W))
    rm = jax.random.randint(keys[8], (depth,), 0, 4, jnp.int32)

    @jax.jit
    def clifford_expval(x, z, cr, ci, rx, rz, rm, s):
        cr = cr * s  # varied per run: forbids runtime result caching
        x, z, cr, ci = jx_core.clifford_scan(x, z, cr, ci, rx, rz, rm)
        return jx_core.expval_iz_sum(x, cr, ci, x.shape[0])

    t_cl = _amortized_time(
        lambda j: clifford_expval(xo_, zo_, cro_, cio_, rx, rz, rm,
                                  1.0 + 0.001 * j),
        lambda out: float(np.asarray(out[0]).reshape(-1)[0]),
    )
    results["clifford_1000q_depth2000_ms"] = t_cl * 1e3
    section_done("clifford scan")
    if budget_spent("100M-qubit mul", "flagship", "on-chip check",
                    "1M-term scale"):
        return finish()

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
        lambda j: mul1(xb1, zb1, cb * (1.0 + 0.01 * j), cz, xb2, zb2, cb, cz),
        lambda out: int(out[0]),
        K=4,
    )
    results["mul_100M_qubit_single_terms_ms"] = t_big / R_CHAIN * 1e3
    section_done("100M-qubit mul")
    if budget_spent("flagship", "on-chip check", "1M-term scale"):
        return finish()

    # ---- 5. flagship product flow: taper + CS-VQE glue ---------------------
    # (flagship and check run BEFORE the 1M scale section: on a cold compile
    # cache the budget clock can truncate the tail, and these two carry the
    # round-over-round evidence that matters most)
    flow_times, breakdown = _flagship_flow_times(with_breakdown=True)
    for k, v in flow_times.items():
        results[k] = v
    if breakdown:
        extra["flagship_breakdown"] = breakdown
        for stage, ms in breakdown.items():
            print(f"#   taper stage {stage}: {ms:.2f} ms", file=sys.stderr)
    section_done("flagship flows")
    if budget_spent("on-chip check", "1M-term scale"):
        return finish()

    # ---- 6. on-chip correctness: device vs host oracle, extended precision -
    # (the full two-precision pass is ``bench.py --check``; this compact pass
    # puts the BASELINE.md "1e-10 on the chip" bar into the driver artifact)
    try:
        failures, errors = _check_core(
            precisions=("extended",), include_lanczos=True,
            include_deflated=False,
        )
        ext = {k: v for k, v in errors.items() if k.startswith("extended:")}
        worst = max(ext, key=ext.get) if ext else None
        extra["check"] = {
            "failures": failures,
            "worst_extended_rel_err": max(ext.values()) if ext else None,
            "worst_metric": worst,
        }
    except Exception as exc:  # a check crash must not cost the timing table
        extra["check"] = {"error": repr(exc)}
    section_done("on-chip check")
    if budget_spent("1M-term scale"):
        return finish()

    # ---- 7. term-axis scale: 10^6 terms (SURVEY 5.7's upper target) --------
    # BASELINE.md's headline sizes stop at 10^5 terms; this measures the same
    # fused rotate+cleanup and the bare cleanup one decade up, HBM-resident.
    # Peak footprint: 2M doubled rows x 32 u32 words x 2 planes (~512 MB) +
    # sort payload lanes -- comfortably inside a 16 GB chip (docs/scaling.md
    # records the measured ceiling).
    T1M = 1_000_000
    x1m = rand_bits(keys[1], (T1M, W))
    z1m = rand_bits(keys[2], (T1M, W))
    c1m_r = as_df(jax.random.normal(keys[3], (T1M,), jnp.float32))
    c1m_i = as_df(jax.random.normal(keys[4], (T1M,), jnp.float32))
    t_rot1m = _amortized_time(
        lambda j: rotate_and_cleanup(x1m, z1m, c1m_r, c1m_i, xr, zr,
                                     0.3 + 0.003 * j),
        lambda out: int(out[4]),
        K=4,
    )
    results["rotate_1000q_1M_terms_ms"] = t_rot1m * 1e3

    # 10^6-row cleanup with genuine duplication pressure: 2^17 distinct rows
    # gathered to 1M (duplication x8), coefficients accumulated per class
    n_distinct = 1 << 17
    idx = jax.random.randint(keys[5], (T1M,), 0, n_distinct, jnp.int32)
    xd = x1m[:n_distinct][idx]
    zd = z1m[:n_distinct][idx]

    @jax.jit
    def cleanup_1m(x, z, cr, ci, s):
        cr = cr * s
        return jx_core.cleanup_sorted(x, z, cr, ci, x.shape[0], 1e-7)

    t_cl1m = _amortized_time(
        lambda j: cleanup_1m(xd, zd, c1m_r, c1m_i, 1.0 + 0.001 * j),
        lambda out: int(out[4]),
        K=4,
    )
    results["cleanup_1M_rows_ms"] = t_cl1m * 1e3
    section_done("1M-term scale")

    finish()


def _emit_headline(
    results: dict, backend: str, path: str,
    interrupted: bool = False, skipped=(), spreads=None, extra=None,
) -> None:
    """ONE JSON line on stdout carrying the headline metric AND the full
    labelled metric table + backend/precision provenance, so round-over-round
    regressions in any metric are machine-visible from the driver artifact
    (round-3 lesson: only the rotate number was parsed; the square regression
    lived in unparsed stderr text)."""
    _PARTIAL["emitted"] = True
    if "rotate_1000q_100k_terms_ms" in results:
        headline_key = "rotate_1000q_100k_terms_ms"
        metric_name = "nonclifford_rotation_1000q_100k_terms"
    else:  # interrupted before section 1 finished: first completed metric
        headline_key = next(iter(results))
        metric_name = headline_key.removesuffix("_ms")
    headline = results[headline_key]
    record = {
        "metric": metric_name,
        "value": round(headline, 3),
        "unit": "ms",
        "vs_baseline": round(1000.0 / headline, 2),
        # which backend actually ran (the CPU-fallback path of
        # _ensure_live_backend also lands here; a CPU number must
        # not be read as a TPU regression)
        "backend": backend,
        "path": path,
        "precision": "extended" if path == "device-xla" else "f64",
        # every labelled metric, with its own vs-1s-baseline speedup
        "metrics": {
            k: {
                "ms": round(v, 3),
                "vs_baseline": round(1000.0 / v, 2),
            }
            for k, v in results.items()
        },
    }
    for k, pct in (spreads or {}).items():
        # spread over the interleaved timing rounds: deltas below this are
        # measurement noise, not kernel changes
        if k in record["metrics"]:
            record["metrics"][k]["spread_pct"] = round(pct, 1)
    record.update(extra or {})
    if backend != "tpu":
        record["tpu_unreachable"] = True
    if interrupted:
        record["interrupted"] = True  # killed mid-run; table is partial
    if skipped:
        record["sections_skipped"] = list(skipped)
    probes = os.environ.get("_SYMMER_BENCH_PROBES")
    if probes:
        try:
            record["probe_history"] = json.loads(probes)
        except ValueError:
            pass
    print(json.dumps(record))


def _host_main():
    """CPU-fallback benchmark: the same four headline operations through the
    packed-uint64 host kernels (np_core + native C++ hash dedup).

    Reference bar: ~1 s per op on a laptop (symmer README.md:50-54).  The
    host packed path beats that on one core; the jitted XLA:CPU path does
    not always (round-3 square: 0.9x), so a dead-tunnel artifact routes here.
    All host arithmetic is float64/complex128 -- full reference precision.
    """
    from symmer_tpu.config import config, enable_x64
    from symmer_tpu.kernels import np_core

    # native f64 everywhere on CPU (pre-empts the extended->x64 auto-upgrade
    # fence so its one-time warning never lands in the artifact tail)
    enable_x64(True)
    config.backend = "host"
    rng = np.random.default_rng(0)
    results = {}
    _PARTIAL.update(results=results, backend="cpu", path="host-packed")
    _install_partial_emitter()

    def timed(fn, reps=3):
        fn()  # warm caches/allocators (the 1-core box cold-start is 5-25x)
        best = min(
            (lambda t0: (fn(), time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(reps)
        )
        return best * 1e3

    # ---- 1. non-Clifford rotation: 1,000 qubits x 100,000 terms -----------
    W64 = (1000 + 63) // 64
    T = 100_000
    x = rng.integers(0, 1 << 63, (T, W64), dtype=np.uint64) << np.uint64(1)
    z = rng.integers(0, 1 << 63, (T, W64), dtype=np.uint64)
    c = rng.normal(size=T) + 1j * rng.normal(size=T)
    xr = rng.integers(0, 1 << 63, (W64,), dtype=np.uint64)
    zr = rng.integers(0, 1 << 63, (W64,), dtype=np.uint64)

    def rot():
        return np_core.rotate_single_cleanup(x, z, c, xr, zr, 0.3, 1e-10)[2]

    results["rotate_1000q_100k_terms_ms"] = timed(rot)

    # ---- 2. square a 1,000-qubit, 500-term operator ------------------------
    x2, z2, c2 = x[:500], z[:500], c[:500]

    def square():
        return np_core.multiply_cleanup_host(x2, z2, c2, x2, z2, c2, 1e-10)[2]

    results["square_1000q_500_terms_ms"] = timed(square)

    # ---- 3. Clifford circuit expectation: 1,000 qubits, depth 2,000 --------
    xo_, zo_, co_ = x[:100].copy(), z[:100].copy(), c[:100].copy()
    rx = rng.integers(0, 1 << 63, (2000, W64), dtype=np.uint64)
    rz = rng.integers(0, 1 << 63, (2000, W64), dtype=np.uint64)

    m4s = np.asarray([(d % 3 + 1) for d in range(2000)], np.int64)

    def cliff():
        cx, cz, cc = np_core.clifford_sequence(xo_, zo_, co_, rx, rz, m4s)
        diag = ~np.any(cx, axis=1)
        return cc[diag].sum()

    results["clifford_1000q_depth2000_ms"] = timed(cliff)

    # ---- 4. two 100,000,000-qubit single Pauli terms ------------------------
    Wb = (100_000_000 + 63) // 64
    xb1 = rng.integers(0, 1 << 63, (1, Wb), dtype=np.uint64)
    zb1 = rng.integers(0, 1 << 63, (1, Wb), dtype=np.uint64)
    xb2 = rng.integers(0, 1 << 63, (Wb,), dtype=np.uint64)
    zb2 = rng.integers(0, 1 << 63, (Wb,), dtype=np.uint64)
    results["mul_100M_qubit_single_terms_ms"] = timed(
        lambda: np_core.multiply_single(xb1, zb1, np.ones(1, complex), xb2, zb2, 1.0)[2]
    )

    # ---- 5. flagship product flow (host path) ------------------------------
    for k, v in _flagship_flow_times().items():
        results[k] = v

    for k, v in results.items():
        if k.startswith("flagship"):
            print(f"# {k}: {v:.1f} ms", file=sys.stderr)
        else:
            print(f"# {k}: {v:.2f} ms  (vs 1s baseline: {1000.0 / v:.1f}x)",
                  file=sys.stderr)

    _late_tpu_retry()
    _emit_headline(results, "cpu", path="host-packed")


def _synthetic_taper_operator(n_qubits=100, n_terms=50_000, n_sym=4, seed=0):
    """Random operator with ``n_sym`` planted Z2 symmetries.

    Qubits are split into ``n_sym`` blocks; every term's X-support is forced
    to even overlap with each block, so the all-Z string on each block
    commutes with the whole operator (a discoverable symmetry, cf. the
    kernel-basis algorithm symmer independent_op.py:90-144)."""
    from symmer_tpu import PauliwordOp

    rng = np.random.default_rng(seed)
    block = n_qubits // n_sym
    xb = rng.integers(0, 2, (n_terms, n_qubits)).astype(bool)
    zb = rng.integers(0, 2, (n_terms, n_qubits)).astype(bool)
    for k in range(n_sym):
        parity = xb[:, k * block : (k + 1) * block].sum(axis=1) & 1
        xb[parity == 1, k * block] ^= True
    coeffs = rng.normal(size=n_terms) + 1j * rng.normal(size=n_terms)
    return PauliwordOp(np.hstack([xb, zb]), coeffs).cleanup()


def _flagship_flow_times(with_breakdown: bool = False):
    """End-to-end product-flow wall times (glue + mixed host/device kernels).

    These guard the *flagship flows* (SURVEY §3.1/§3.2) against glue-path
    regressions -- the four kernel metrics above can stay fast while the
    product gets slow.  Reported: second-run wall time (first run pays
    jit compiles).  With ``with_breakdown`` also returns a per-stage split
    of the 100q taper flow (symmetry discovery / sector assignment /
    rotate+project / residual glue), so the artifact shows WHERE the
    flagship milliseconds go (BENCH_r04 lesson: the flow was timed as one
    opaque lambda while device == host, and the dominant stage was
    invisible)."""
    from symmer_tpu import ContextualSubspace, PauliwordOp, QubitTapering

    out = {}

    # (a) synthetic 100q x 50k-term Z2 tapering -- both execution paths
    # (the host path is a useful transport-independent reference: on a
    # REMOTE-attached TPU the transfers dominate this size and the packed
    # C++ host path can win; on local attachment the device path wins)
    from symmer_tpu.config import config

    H_big = _synthetic_taper_operator()
    ref_state = np.zeros(H_big.n_qubits, dtype=int)

    def best_of(flow, n=3):
        # best-of-n: a single timed run is exposed to transient process
        # noise (a cold first bench invocation once recorded 269 ms for a
        # flow that steady-states at 54 ms -- background compile-cache
        # writes from the earlier sections were still flushing)
        flow()  # warm the compile caches
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            flow()
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    def taper_flow():
        qt = QubitTapering(H_big)
        return qt.taper_it(ref_state=ref_state)

    out["flagship_taper_100q_50k_terms_ms"] = best_of(taper_flow)
    old_backend = config.backend
    try:
        config.backend = "host"
        out["flagship_taper_hostpath_ms"] = best_of(taper_flow)
    finally:
        config.backend = old_backend

    import jax

    on_accelerator = jax.devices()[0].platform != "cpu"
    if on_accelerator:
        # device-RESIDENT steady state at the headline size too: H already
        # on chip (the serving flow), so neither upload nor download is in
        # the loop.  On a REMOTE-attached chip this can LOSE to the host
        # path (measured: 41 vs 19 ms -- the flow's one scalar sync costs a
        # ~30 ms tunnel round trip, more than the whole packed-C++ flow),
        # which is exactly why the default path routes this size to the
        # host; at 1000q x 200k the kernel work dwarfs the sync and the
        # resident path wins 6x.  Reported so the artifact shows the
        # latency floor, not just the win.
        qt_100 = QubitTapering(H_big)
        H_res100 = H_big.to_device()

        def taper_flow_resident():
            return qt_100.taper_it(ref_state=ref_state, aux_operator=H_res100)

        out["flagship_taper_100q_50k_resident_ms"] = best_of(
            taper_flow_resident
        )
        del H_res100, qt_100

    breakdown = _taper_stage_breakdown(H_big, ref_state) if with_breakdown \
        else None

    # (a') the decisive size: 1,000 qubits x 200,000 terms.  Three paths:
    #   - default (host planes in, device kernels where profitable),
    #   - device-RESIDENT steady state (H already on chip, taper_it
    #     aux_operator=H_dev -- the production serving flow: one scalar
    #     sync per projection, no operator transfer),
    #   - forced host (packed C++): the transport-independent reference.
    H_huge = _synthetic_taper_operator(n_qubits=1000, n_terms=200_000, seed=1)
    ref_huge = np.zeros(H_huge.n_qubits, dtype=int)
    qt_huge = QubitTapering(H_huge)  # symmetry discovery paid once here

    def taper_huge():
        return qt_huge.taper_it(ref_state=ref_huge)

    out["flagship_taper_1000q_200k_ms"] = best_of(taper_huge)
    if on_accelerator:
        # resident flow only makes sense with a real accelerator (on the CPU
        # fallback it would time XLA:CPU against the native host path)
        H_res = H_huge.to_device()

        def taper_huge_resident():
            return qt_huge.taper_it(ref_state=ref_huge, aux_operator=H_res)

        out["flagship_taper_1000q_200k_resident_ms"] = best_of(
            taper_huge_resident
        )
        del H_res
    try:
        config.backend = "host"
        out["flagship_taper_1000q_200k_hostpath_ms"] = best_of(taper_huge)
    finally:
        config.backend = old_backend
    del H_huge, qt_huge

    # (b) Be/STO-3G taper -> contextual subspace -> 3-qubit projection
    path = _be_data_path()
    if path:
        with open(path) as f:
            H_data = json.load(f)
        H_op = PauliwordOp.from_dictionary(H_data["hamiltonian"])
        hf = H_data["data"]["hf_array"]

        def cs_vqe_flow():
            qt = QubitTapering(H_op)
            H_taper = qt.taper_it(ref_state=hf)
            cs = ContextualSubspace(
                H_taper, noncontextual_strategy="SingleSweep_magnitude"
            )
            cs.update_stabilizers(3, strategy="aux_preserving")
            return cs.project_onto_subspace()

        out["flagship_cs_vqe_Be_ms"] = best_of(cs_vqe_flow)
    return (out, breakdown) if with_breakdown else out


def _taper_stage_breakdown(H, ref_state, n=3):
    """Per-stage wall times of the taper flow (best of ``n`` each).

    Stages mirror the reference call stack (SURVEY 3.1: qubit_tapering.py:54
    -> independent_op.py:275 -> projection/base.py:44):
      symmetry_discovery  IndependentOp.symmetry_generators (GF(2) kernel
                          basis of the term matrix, sketched+verified),
      sector_assignment   update_sector (batched stabilizer expvals on the
                          reference state),
      rotate_project      the fused Clifford rotate + stabilizer projection
                          + cleanup (sector pre-assigned),
      glue_ms             total flow minus the three stages (Python
                          orchestration, warnings, copies).
    """
    from symmer_tpu import QuantumState, QubitTapering
    from symmer_tpu.operators import IndependentOp

    def bo(f):
        f()
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    stages = {}
    stages["symmetry_discovery_ms"] = bo(
        lambda: IndependentOp.symmetry_generators(H)
    )
    qt = QubitTapering(H)  # generators cached on the instance after this
    psi_ref = QuantumState(np.asarray(ref_state))
    stages["sector_assignment_ms"] = bo(
        lambda: qt.symmetry_generators.update_sector(psi_ref)
    )
    sector = np.asarray(qt.symmetry_generators.coeff_vec.real, dtype=int)
    stages["rotate_project_ms"] = bo(lambda: qt.taper_it(sector=sector))
    total = bo(lambda: QubitTapering(H).taper_it(ref_state=ref_state))
    # a fresh QubitTapering re-runs symmetry discovery, so total covers all
    # three stages; the remainder is host orchestration glue
    stages["glue_ms"] = max(
        total - sum(stages.values()), 0.0
    )
    stages["total_ms"] = total
    return {k: round(v, 3) for k, v in stages.items()}


def _be_data_path():
    """Be Hamiltonian fixture: mounted reference checkout preferred, the
    vendored tests/data copy otherwise; None when neither exists."""
    here = os.path.dirname(os.path.abspath(__file__))
    for p in (
        "/root/reference/tests/hamiltonian_data/Be_STO-3G_SINGLET_JW.json",
        os.path.join(here, "tests", "data", "hamiltonians",
                     "Be_STO-3G_SINGLET_JW.json"),
    ):
        if os.path.exists(p):
            return p
    return None


def check():
    """On-device correctness: production dispatch kernels vs the host oracle.

    Forces ``config.backend = 'device'`` so every kernel executes on the real
    chip, then compares against the ``backend = 'host'`` packed-numpy (f64)
    results -- in BOTH device precisions:

      extended  double-float [hi, lo] coefficient planes (jx_df): cleanup /
                multiply / rotations / fused taper must match host f64 to
                1e-12 relative -- the BASELINE.md "1e-10 on the chip" bar.
      f32       plain float32 planes: 2e-5 relative.

    expval / apply_state run the (still plain-f32) state kernels in either
    mode and keep f32 tolerances.
    """
    import jax

    _honour_platform_env()

    from symmer_tpu.config import enable_compile_cache

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    )

    dev = jax.devices()[0]
    print(f"# check backend: {dev.platform} ({dev})", file=sys.stderr)
    failures, errors = _check_core()
    ext_errs = [v for k, v in errors.items() if k.startswith("extended:")]
    print(json.dumps({
        "metric": "device_host_check_failures",
        "value": len(failures),
        "unit": "kernels",
        "vs_baseline": 1.0 if not failures else 0.0,
        "backend": dev.platform,
        # worst extended-precision error: the BASELINE.md "1e-10 on the chip"
        # bar, machine-readable per round
        "worst_extended_rel_err": max(ext_errs) if ext_errs else None,
        "errors": {k: float(f"{v:.3e}") for k, v in errors.items()},
        "failed": failures,
    }))
    return 1 if failures else 0


def _check_core(
    precisions=(("extended", 1e-12), ("f32", 2e-5)),
    include_lanczos: bool = True,
    include_deflated: bool = True,
):
    """Device-vs-host-oracle correctness pass; returns (failures, errors).

    ``precisions`` may also name modes without tolerances (("extended",)),
    in which case the default tolerance for that mode applies.  The full
    two-precision pass backs ``bench.py --check``; ``main`` folds a compact
    extended-only pass into the default artifact so the on-chip parity
    claim is evidenced by the driver, not only by the builder.
    """
    from symmer_tpu import PauliwordOp, QuantumState
    from symmer_tpu.config import config

    _DEFAULT_RTOL = {"extended": 1e-12, "f32": 2e-5}
    precisions = [
        p if isinstance(p, tuple) else (p, _DEFAULT_RTOL[p]) for p in precisions
    ]

    rng = np.random.default_rng(42)
    STATE_RTOL = 2e-5  # state kernels (expval/apply_state) are plain f32

    def term_dicts_close(a, b, rtol):
        da, db = a.to_dictionary, b.to_dictionary
        scale = max((abs(v) for v in db.values()), default=1.0)
        if set(da) != set(db):
            sym = set(da) ^ set(db)
            worst = max(abs(da.get(k, db.get(k, 0))) for k in sym)
            return False, f"term sets differ ({len(sym)} terms, worst |c|={worst:.2e})"
        err = max((abs(da[k] - db[k]) for k in da), default=0.0)
        return err <= rtol * scale, f"max|dc|={err:.2e} (tol {rtol * scale:.2e})"

    # operator with heavy duplication + near-cancellation pressure
    nq, T = 100, 6000
    base = PauliwordOp.random(nq, T // 2, density=0.4)
    dup = PauliwordOp.from_planes(
        base.x_pack.copy(), base.z_pack.copy(),
        base.coeff_vec * rng.choice([1.0, 1.0, -0.5], T // 2), nq,
    )
    op = base.append(dup)
    small = PauliwordOp.random(nq, 40, density=0.4)

    rots = []
    for k in range(12):
        p = PauliwordOp.random(nq, 1)
        p.coeff_vec[:] = 1
        rots.append((p, None if k % 3 else 0.1 + 0.2 * k))

    psi = QuantumState.random(nq, 64)

    # expval needs terms that actually connect the state's basis rows: Z-only
    # terms hit the diagonal, and terms with x = s_b1 ^ s_b2 hop b2 -> b1
    # (a generic random 100q term connects nothing and the check is vacuous)
    s = psi._s_pack
    hop = rng.integers(0, len(s), (60, 2))
    x_ev = np.vstack([np.zeros((30, s.shape[1]), np.uint64), s[hop[:, 0]] ^ s[hop[:, 1]]])
    z_ev = PauliwordOp.random(nq, 90, density=0.3).z_pack
    op_ev = PauliwordOp.from_planes(
        x_ev, z_ev, rng.normal(size=90) + 1j * rng.normal(size=90), nq
    )

    failures = []
    errors = {}  # check name -> worst observed relative error

    def run_all():
        return {
            "cleanup": op.cleanup(),
            "multiply": op.__mul__(small, zero_threshold=1e-6),
            "rotations": op.perform_rotations(rots),
            "anticommutes": op[:500].anticommutes_termwise(small),
            "expval": op_ev.expval(psi),
            "apply_state": op_ev * psi,
        }

    H_sym = _synthetic_taper_operator(n_qubits=64, n_terms=8000, n_sym=3, seed=7)
    ref_state = np.zeros(H_sym.n_qubits, dtype=int)

    def taper_flow():
        from symmer_tpu import QubitTapering

        return QubitTapering(H_sym).taper_it(ref_state=ref_state)

    config.backend = "host"
    host = run_all()
    t_host = taper_flow()
    config.backend = "auto"

    for precision, rtol in precisions:
        config.backend = "device"
        config.device_precision = precision
        try:
            devr = run_all()
            t_dev = taper_flow()
        finally:
            config.backend = "auto"
            config.device_precision = "extended"

        for name in ("cleanup", "multiply", "rotations"):
            ok, msg = term_dicts_close(devr[name], host[name], rtol)
            print(f"# [{precision}] {name}: {'PASS' if ok else 'FAIL'} {msg}",
                  file=sys.stderr)
            if "max|dc|=" in msg:
                errors[f"{precision}:{name}"] = float(
                    msg.split("max|dc|=")[1].split(" ")[0]
                )
            if not ok:
                failures.append(f"{precision}:{name}")

        ok = bool(np.array_equal(devr["anticommutes"], host["anticommutes"]))
        print(f"# [{precision}] anticommutes: {'PASS' if ok else 'FAIL'} (exact)",
              file=sys.stderr)
        if not ok:
            failures.append(f"{precision}:anticommutes")

        err = abs(devr["expval"] - host["expval"]) / max(abs(host["expval"]), 1e-12)
        ok = err <= 1e-4
        errors[f"{precision}:expval"] = float(err)
        print(f"# [{precision}] expval: {'PASS' if ok else 'FAIL'} rel_err={err:.2e}",
              file=sys.stderr)
        if not ok:
            failures.append(f"{precision}:expval")

        # fused taper projection (clifford_rotate_project): full flagship flow
        ok, msg = term_dicts_close(t_dev, t_host, rtol)
        print(f"# [{precision}] taper_projection: {'PASS' if ok else 'FAIL'} {msg}",
              file=sys.stderr)
        if "max|dc|=" in msg:
            errors[f"{precision}:taper_projection"] = float(
                msg.split("max|dc|=")[1].split(" ")[0]
            )
        if not ok:
            failures.append(f"{precision}:taper_projection")

        dh, dd = host["apply_state"].to_dictionary, devr["apply_state"].to_dictionary
        common = set(dh) & set(dd)
        amp_scale = max(abs(v) for v in dh.values())
        missing = [k for k in set(dh) ^ set(dd)
                   if abs(dh.get(k, dd.get(k, 0))) > STATE_RTOL * amp_scale]
        err = max((abs(dh[k] - dd[k]) for k in common), default=0.0)
        ok = not missing and err <= STATE_RTOL * amp_scale
        print(f"# [{precision}] apply_state: {'PASS' if ok else 'FAIL'} "
              f"max|da|={err:.2e}, {len(missing)} rows differ beyond tol",
              file=sys.stderr)
        if not ok:
            failures.append(f"{precision}:apply_state")

    if include_lanczos:
        # device Lanczos eigensolver vs host ARPACK (extended-precision path;
        # same operator as --lanczos so the compile cache is shared)
        from symmer_tpu.kernels import jx_lanczos
        from symmer_tpu.utils import exact_gs_energy

        np.random.seed(11)
        lop = PauliwordOp.random(12, 400, complex_coeffs=False)
        lop = (lop + lop.dagger).cleanup()
        evals, _ = jx_lanczos.lanczos_ground_state(
            lop.x_pack, lop.z_pack, lop.coeff_vec, lop.n_qubits
        )
        gs_host = exact_gs_energy(lop.to_sparse_matrix)[0]
        err = abs(evals[0] - gs_host) / max(abs(gs_host), 1.0)
        ok = err <= 1e-10
        errors["extended:lanczos_gs"] = float(err)
        print(f"# [extended] lanczos_gs: {'PASS' if ok else 'FAIL'} "
              f"rel_err={err:.2e}", file=sys.stderr)
        if not ok:
            failures.append("extended:lanczos_gs")

    if include_deflated:
        from symmer_tpu.kernels import jx_lanczos

        # deflated restarts: degenerate multiplet resolved WITH multiplicity
        # (small op keeps the extra compiles cheap; h(2q) (x) I doubles levels)
        np.random.seed(13)
        dop = PauliwordOp.random(2, 6, complex_coeffs=False)
        dop = (dop + dop.dagger).cleanup().tensor(
            PauliwordOp.from_dictionary({"I": 1.0})
        )
        devals, dvecs = jx_lanczos.lanczos_lowest_eigsh(
            dop.x_pack, dop.z_pack, dop.coeff_vec, dop.n_qubits, n_vecs=2
        )
        dense_pair = np.linalg.eigvalsh(
            np.asarray(dop.to_sparse_matrix.todense())
        )[:2]
        err = float(np.max(np.abs(devals - dense_pair))) / max(
            abs(dense_pair[0]), 1.0
        )
        orth = abs(np.vdot(dvecs[:, 0], dvecs[:, 1]))
        ok = err <= 1e-10 and orth < 1e-8
        errors["extended:lanczos_deflated_multiplet"] = float(err)
        print(f"# [extended] lanczos_deflated_multiplet: "
              f"{'PASS' if ok else 'FAIL'} rel_err={err:.2e} |<y0|y1>|={orth:.1e}",
              file=sys.stderr)
        if not ok:
            failures.append("extended:lanczos_deflated_multiplet")

    return failures, errors


def fuzz():
    """Time-budgeted randomized device-vs-host parity fuzz on the live chip.

    ``--check`` compares a FIXED operator set; this mode draws fresh random
    shapes, densities, rotation mixes and planted-symmetry tapers every trial
    and compares the production device dispatch (extended precision) against
    the host packed-f64 oracle.  Shapes are drawn bucket-friendly (the
    dispatch layer pow2-buckets the term axis) so compile cost amortises and
    the budget is spent executing, not tracing.

    Usage: ``python bench.py --fuzz [budget_seconds] [seed]``
    (defaults: 600 s, a fresh seed printed for reproduction).
    """
    import jax

    _honour_platform_env()

    from symmer_tpu.config import enable_compile_cache

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    )

    from symmer_tpu import PauliwordOp, QuantumState, QubitTapering
    from symmer_tpu.config import config

    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    budget_s = float(argv[0]) if argv else 600.0
    seed = int(argv[1]) if len(argv) > 1 else int.from_bytes(os.urandom(4), "little")
    rng = np.random.default_rng(seed)

    dev = jax.devices()[0]
    print(f"# fuzz backend: {dev.platform} ({dev}), budget {budget_s:.0f}s, "
          f"seed {seed}", file=sys.stderr)

    RTOL = 1e-11  # extended-precision bar (check() observes 1e-13..1e-15)

    def dicts_close(a, b, drop_below=0.0):
        """Compare term dicts; symmetric-difference terms are failures unless
        they sit at/below a zero-threshold boundary (|c| <= drop_below)."""
        da, db = a.to_dictionary, b.to_dictionary
        scale = max((abs(v) for v in db.values()), default=1.0)
        bad_sym = [k for k in set(da) ^ set(db)
                   if abs(da.get(k, db.get(k, 0))) > max(drop_below * 1.01,
                                                         RTOL * scale)]
        if bad_sym:
            worst = max(abs(da.get(k, db.get(k, 0))) for k in bad_sym)
            return False, 0.0, f"{len(bad_sym)} terms differ (worst |c|={worst:.2e})"
        err = max((abs(da[k] - db[k]) for k in set(da) & set(db)), default=0.0)
        return err <= RTOL * scale, err / scale, f"max|dc|/scale={err / scale:.2e}"

    # bucket-friendly shape pools: W in {1, 2} plus the 100q flagship width;
    # term counts land in a handful of pow2 dispatch buckets
    NQ_POOL = [9, 23, 47, 64, 100, 128]
    T_POOL = [60, 200, 700, 1500, 3000, 6000]

    def rand_op(nq, T, dup_frac=0.0, cancel=False):
        dens = float(rng.uniform(0.1, 0.7))
        op = PauliwordOp.random(nq, T, density=dens)
        op.coeff_vec[:] = rng.normal(size=T) + 1j * rng.normal(size=T)
        if dup_frac > 0:
            k = max(1, int(T * dup_frac))
            src = rng.integers(0, T, k)
            dup = PauliwordOp.from_planes(
                op.x_pack[src].copy(), op.z_pack[src].copy(),
                (-op.coeff_vec[src] if cancel
                 else op.coeff_vec[src] * rng.normal(size=k)), nq)
            op = op.append(dup)
        return op

    def run_both(flow):
        prev_precision = config.device_precision
        config.backend = "host"
        host = flow()
        config.backend = "device"
        config.device_precision = "extended"
        try:
            devr = flow()
        finally:
            config.backend = "auto"
            config.device_precision = prev_precision
        return host, devr

    def trial_cleanup():
        nq = int(rng.choice(NQ_POOL)); T = int(rng.choice(T_POOL))
        op = rand_op(nq, T, dup_frac=float(rng.uniform(0.2, 1.0)),
                     cancel=bool(rng.random() < 0.3))
        host, devr = run_both(op.cleanup)
        return dicts_close(devr, host)

    def trial_multiply():
        nq = int(rng.choice(NQ_POOL))
        a = rand_op(nq, int(rng.choice(T_POOL)))
        b = rand_op(nq, int(rng.choice([20, 60, 200])))
        thr = 1e-6
        host, devr = run_both(lambda: a.__mul__(b, zero_threshold=thr))
        return dicts_close(devr, host, drop_below=thr)

    def trial_rotations():
        nq = int(rng.choice(NQ_POOL)); T = int(rng.choice(T_POOL))
        op = rand_op(nq, T, dup_frac=0.3)
        R = int(rng.choice([6, 12]))
        rots = []
        for k in range(R):
            p = PauliwordOp.random(nq, 1)
            p.coeff_vec[:] = 1
            rots.append((p, None if rng.random() < 0.5
                         else float(rng.uniform(-3.0, 3.0))))
        host, devr = run_both(lambda: op.perform_rotations(rots))
        return dicts_close(devr, host)

    def trial_taper():
        nq = int(rng.choice([32, 64])); n_sym = int(rng.choice([2, 3, 4]))
        H = _synthetic_taper_operator(n_qubits=nq,
                                      n_terms=int(rng.choice([2000, 8000])),
                                      n_sym=n_sym,
                                      seed=int(rng.integers(0, 2**31)))
        ref = np.zeros(nq, dtype=int)
        host, devr = run_both(lambda: QubitTapering(H).taper_it(ref_state=ref))
        return dicts_close(devr, host)

    def trial_expval():
        nq = int(rng.choice(NQ_POOL)); B = int(rng.choice([16, 64]))
        psi = QuantumState.random(nq, B)
        s = psi._s_pack
        hop = rng.integers(0, len(s), (48, 2))
        xe = np.vstack([np.zeros((16, s.shape[1]), np.uint64),
                        s[hop[:, 0]] ^ s[hop[:, 1]]])
        ze = PauliwordOp.random(nq, 64, density=0.3).z_pack
        op = PauliwordOp.from_planes(
            xe, ze, rng.normal(size=64) + 1j * rng.normal(size=64), nq)
        host, devr = run_both(lambda: op.expval(psi))
        err = abs(devr - host) / max(abs(host), 1e-12)
        return err <= 1e-4, float(err), f"rel_err={err:.2e}"

    def trial_apply_state():
        # state kernels carry plain-f32 amplitudes (cf. check()'s STATE_RTOL)
        nq = int(rng.choice(NQ_POOL)); B = int(rng.choice([16, 64]))
        psi = QuantumState.random(nq, B)
        s = psi._s_pack
        hop = rng.integers(0, len(s), (48, 2))
        xe = np.vstack([np.zeros((16, s.shape[1]), np.uint64),
                        s[hop[:, 0]] ^ s[hop[:, 1]]])
        ze = PauliwordOp.random(nq, 64, density=0.3).z_pack
        op = PauliwordOp.from_planes(
            xe, ze, rng.normal(size=64) + 1j * rng.normal(size=64), nq)
        host, devr = run_both(lambda: op * psi)
        da = dict(zip((r.tobytes() for r in host._s_pack), host._amps))
        db = dict(zip((r.tobytes() for r in devr._s_pack), devr._amps))
        scale = max((abs(v) for v in da.values()), default=1.0)
        tol = 1e-4 * scale
        bad = [k for k in set(da) ^ set(db)
               if abs(da.get(k, db.get(k, 0))) > tol]
        if bad:
            worst = max(abs(da.get(k, db.get(k, 0))) for k in bad)
            return False, 0.0, f"{len(bad)} basis rows differ (worst |a|={worst:.2e})"
        err = max((abs(da[k] - db[k]) for k in set(da) & set(db)), default=0.0)
        return err <= tol, err / scale, f"max|da|/scale={err / scale:.2e}"

    trials = {"cleanup": trial_cleanup, "multiply": trial_multiply,
              "rotations": trial_rotations, "taper": trial_taper,
              "expval": trial_expval, "apply_state": trial_apply_state}
    counts = {k: 0 for k in trials}
    worst = {k: 0.0 for k in trials}
    failures = []

    t0 = time.perf_counter()
    # one warm-up per scenario first so the budget isn't all compiles
    order = list(trials) * 10_000
    for i, name in enumerate(order):
        if i >= len(trials) and time.perf_counter() - t0 > budget_s:
            break
        ok, err, msg = trials[name]()
        counts[name] += 1
        worst[name] = max(worst[name], err)
        if not ok:
            failures.append(f"{name}[{counts[name]}]: {msg}")
            print(f"# FAIL {name} trial {counts[name]}: {msg} (seed {seed})",
                  file=sys.stderr)
    elapsed = time.perf_counter() - t0

    n = sum(counts.values())
    print(f"# fuzz: {n} trials in {elapsed:.0f}s, {len(failures)} failures; "
          f"worst rel err per kernel: "
          + ", ".join(f"{k}={v:.2e}" for k, v in worst.items()),
          file=sys.stderr)
    print(json.dumps({
        "metric": "fuzz_parity_failures",
        "value": len(failures),
        "unit": f"failures/{n} trials",
        "vs_baseline": 1.0 if not failures else 0.0,
        "backend": dev.platform,
        "seed": seed,
        "elapsed_s": round(elapsed, 1),
        "trials": counts,
        "worst_rel_err": {k: float(f"{v:.3e}") for k, v in worst.items()},
        "failed": failures[:20],
    }))
    return 1 if failures else 0


def sweep():
    """Term-count scaling sweep of the fused rotate+cleanup kernel.

    Catches glue- and kernel-path regressions that the single 100k-term
    headline number can hide (e.g. a change that helps at 2^17 but
    regresses the small-operator dispatch).  Prints one table row per size.
    """
    import jax

    _honour_platform_env()

    from symmer_tpu.config import enable_compile_cache

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    )

    import jax.numpy as jnp

    from symmer_tpu.kernels import jx_core

    dev = jax.devices()[0]
    print(f"# sweep backend: {dev.platform} ({dev})", file=sys.stderr)
    n_qubits = 1000
    W = 2 * ((n_qubits + 63) // 64)
    keys = jax.random.split(jax.random.key(1), 6)
    rows = []
    f = jax.jit(
        lambda x, z, cr, ci, xr, zr, a: jx_core.rotate_nonclifford_cleanup(
            x, z, cr, ci, xr, zr, a, x.shape[0], 1e-7
        )
    )
    for log_t in (12, 14, 16, 17):
        T = 1 << log_t
        x = jax.random.bits(keys[0], (T, W), dtype=jnp.uint32)
        z = jax.random.bits(keys[1], (T, W), dtype=jnp.uint32)
        cr = jax.random.normal(keys[2], (T,), jnp.float32)
        ci = jax.random.normal(keys[3], (T,), jnp.float32)
        xr = jax.random.bits(keys[4], (W,), dtype=jnp.uint32)
        zr = jax.random.bits(keys[5], (W,), dtype=jnp.uint32)
        t = _amortized_time(
            lambda j: f(x, z, cr, ci, xr, zr, 0.3 + 1e-4 * j),
            lambda o: int(o[4]),
        )
        rows.append((T, t * 1e3))
        print(f"# rotate_cleanup T=2^{log_t} ({T}): {t * 1e3:.3f} ms", file=sys.stderr)
    print(json.dumps({
        "metric": "rotate_cleanup_sweep_2e17",
        "value": round(rows[-1][1], 3),
        "unit": "ms",
        "vs_baseline": round(1000.0 / rows[-1][1], 2),
    }))


def lanczos_bench():
    """Device Lanczos vs host CSR+ARPACK on a 12-qubit, 400-term operator.

    Warm wall time of ``exact_gs_energy_device``'s kernel path against the
    reference-style host flow (``to_sparse_matrix`` + scipy ``eigsh``), with
    a 1e-10 ground-energy parity gate.  First invocation pays the remote
    compiles into ``.jax_cache``; report the second, warm, run.
    """
    import jax

    _honour_platform_env()

    from symmer_tpu.config import enable_compile_cache

    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
    )
    enable_compile_cache(cache_dir)

    from symmer_tpu import PauliwordOp
    from symmer_tpu.kernels import jx_lanczos
    from symmer_tpu.utils import exact_gs_energy

    np.random.seed(11)
    op = PauliwordOp.random(12, 400, complex_coeffs=False)
    op = (op + op.dagger).cleanup()

    def dev_solve():
        return jx_lanczos.lanczos_ground_state(
            op.x_pack, op.z_pack, op.coeff_vec, op.n_qubits
        )

    t0 = time.perf_counter()
    evals, _ = dev_solve()
    cold_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    evals, _ = dev_solve()
    warm_ms = (time.perf_counter() - t0) * 1e3

    t0 = time.perf_counter()
    gs_host, _ = exact_gs_energy(op.to_sparse_matrix)
    host_ms = (time.perf_counter() - t0) * 1e3

    err = abs(evals[0] - gs_host)
    print(
        f"# lanczos 12q/{op.n_terms}t: device warm {warm_ms:.0f} ms "
        f"(cold {cold_s:.0f} s), host CSR+ARPACK {host_ms:.0f} ms, "
        f"|dE| = {err:.2e}",
        file=sys.stderr,
    )
    ok = err < 1e-10

    # ---- multiplicity: deflated restarts vs block (band) recurrence --------
    # The block solver resolves a multiplet in ONE recurrence; whether it
    # should be the default depends on its compile cost on the actual
    # backend (opt-in pending a TPU measurement, ROADMAP) -- this section IS
    # that measurement: cold (compile-inclusive) + warm wall time for both
    # drivers on the same 4-fold task, with a dense parity gate.
    np.random.seed(17)
    mop = PauliwordOp.random(9, 200, complex_coeffs=False)
    mop = (mop + mop.dagger).cleanup().tensor(
        PauliwordOp.from_dictionary({"I": 1.0})
    )  # exact 2-fold degeneracy at 10 qubits
    margs = (mop.x_pack, mop.z_pack, mop.coeff_vec, mop.n_qubits)
    dense4 = np.linalg.eigvalsh(np.asarray(mop.to_sparse_matrix.todense()))[:4]

    def run_mult(fn):
        t0 = time.perf_counter()
        ev, _ = fn()
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        ev, _ = fn()
        warm = (time.perf_counter() - t0) * 1e3
        perr = float(np.max(np.abs(np.asarray(ev)[:4] - dense4)))
        return cold, warm, perr

    defl_cold, defl_warm, defl_err = run_mult(
        lambda: jx_lanczos.lanczos_lowest_eigsh(*margs, n_vecs=4)
    )
    blk_cold, blk_warm, blk_err = run_mult(
        lambda: jx_lanczos.lanczos_block_eigsh(*margs, n_vecs=4)
    )
    print(
        f"# multiplicity 10q/4vec: deflated cold {defl_cold:.0f} s warm "
        f"{defl_warm:.0f} ms |dE| {defl_err:.2e} | block cold {blk_cold:.0f} s "
        f"warm {blk_warm:.0f} ms |dE| {blk_err:.2e}",
        file=sys.stderr,
    )
    mult_ok = defl_err < 1e-9 and blk_err < 1e-9

    import jax as _jax

    print(json.dumps({
        "metric": "device_lanczos_12q_400t_ms",
        "value": round(warm_ms, 1),
        "unit": "ms",
        "vs_baseline": round(host_ms / warm_ms, 2) if ok else 0.0,
        "backend": _jax.devices()[0].platform,
        "host_arpack_ms": round(host_ms, 1),
        "cold_s": round(cold_s, 1),
        "multiplet_deflated": {"cold_s": round(defl_cold, 1),
                               "warm_ms": round(defl_warm, 1),
                               "err": float(f"{defl_err:.2e}")},
        "multiplet_block": {"cold_s": round(blk_cold, 1),
                            "warm_ms": round(blk_warm, 1),
                            "err": float(f"{blk_err:.2e}")},
        "block_wins_warm": bool(blk_warm < defl_warm),
    }))
    return 0 if (ok and mult_ok) else 1


def mesh_bench():
    """Sharded-vs-single-device wall times on whatever mesh is reachable.

    Runs the five sharded product paths (cleanup / square / rotations /
    fused taper / nu-search) under ``symmer_tpu.use_mesh`` and reports each
    next to its single-device time.  With one real chip today this measures
    the virtual-CPU mesh (set ``XLA_FLAGS=--xla_force_host_platform_device_count=N
    JAX_PLATFORMS=cpu``); the same command produces the multi-chip scaling
    table the moment more devices are attached.
    """
    import jax

    _honour_platform_env()

    devs = jax.devices()
    n_dev = 1 << (len(devs).bit_length() - 1)  # largest power of two
    if n_dev < 2:
        print(
            "# only one device visible: run under JAX_PLATFORMS=cpu "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8 for a "
            "virtual mesh, or attach more chips",
            file=sys.stderr,
        )
        print(json.dumps({
            "metric": "mesh_bench_devices", "value": 1,
            "unit": "devices", "vs_baseline": 0.0,
        }))
        return 0

    import symmer_tpu
    from symmer_tpu import PauliwordOp, QubitTapering
    from symmer_tpu.config import config, enable_compile_cache, enable_x64

    if devs[0].platform == "cpu":
        # virtual-CPU mesh: native f64 planes (pre-empts the extended->x64
        # fence so its warning never lands in the artifact tail)
        enable_x64(True)
    from symmer_tpu.parallel.mesh import get_mesh

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    )
    mesh = get_mesh(n_dev)
    print(
        f"# mesh bench: {n_dev} x {devs[0].platform} devices", file=sys.stderr
    )
    rng = np.random.default_rng(0)
    config.mesh_threshold = 1024

    def timed(fn):
        fn()  # warm / compile
        t0 = time.perf_counter()
        fn()
        return (time.perf_counter() - t0) * 1e3

    rows = {}

    def both(name, fn):
        config.backend = "device"
        t_single = timed(fn)
        with symmer_tpu.use_mesh(mesh):
            t_mesh = timed(fn)
        config.backend = "auto"
        rows[name] = (t_single, t_mesh)
        print(
            f"# {name}: single {t_single:.1f} ms | mesh[{n_dev}] {t_mesh:.1f} ms",
            file=sys.stderr,
        )

    def dup_heavy(nq, T, n_distinct):
        base = PauliwordOp.random(nq, n_distinct, density=0.5)
        idx = rng.integers(0, base.n_terms, T)
        c = rng.normal(size=T) + 1j * rng.normal(size=T)
        return PauliwordOp.from_planes(base.x_pack[idx], base.z_pack[idx], c, nq)

    big = dup_heavy(128, 1 << 18, 1 << 16)
    both("cleanup_2e18", lambda: big.cleanup())

    H = dup_heavy(128, 1 << 9, 1 << 9)
    both("square_2e9_terms", lambda: (H * H).cleanup())

    op = dup_heavy(128, 1 << 14, 1 << 13)
    rots = []
    for k in range(6):
        p = PauliwordOp.random(128, 1)
        p.coeff_vec[:] = 1
        rots.append((p, None if k % 2 else 0.25 + 0.1 * k))
    both("rotations_2e14", lambda: op.perform_rotations(rots))

    H_t = _synthetic_taper_operator(n_qubits=100, n_terms=50_000, n_sym=4, seed=0)
    ref = np.zeros(H_t.n_qubits, dtype=int)
    both("fused_taper_100q_50k", lambda: QubitTapering(H_t).taper_it(ref_state=ref))

    from symmer_tpu.operators import NoncontextualOp
    from symmer_tpu.operators.noncontextual_op import NoncontextualSolver

    np.random.seed(1)
    nc = NoncontextualOp.random(10, n_cliques=2, n_commuting_terms=40)
    solver = NoncontextualSolver(nc)
    n_free = int(np.sum(~solver.fixed_ev_mask))
    both("nu_search_brute_force", lambda: solver._brute_force_device(n_free))

    # mesh-sharded exact eigensolve: the diagonal table shards over the
    # statevector row-block axis (one tiled all-gather per matvec)
    from symmer_tpu.kernels import jx_lanczos

    np.random.seed(5)
    lop = PauliwordOp.random(10, 80, complex_coeffs=False)
    lop = (lop + lop.dagger).cleanup()
    largs = (lop.x_pack, lop.z_pack, lop.coeff_vec, lop.n_qubits)
    if jx_lanczos._mesh_ok(mesh, lop.n_qubits):
        config.backend = "device"
        t_single = timed(lambda: jx_lanczos.lanczos_ground_state(*largs))
        t_mesh = timed(
            lambda: jx_lanczos.lanczos_ground_state(*largs, mesh=mesh)
        )
        config.backend = "auto"
        rows["lanczos_10q"] = (t_single, t_mesh)
        print(
            f"# lanczos_10q: single {t_single:.1f} ms | "
            f"mesh[{n_dev}] {t_mesh:.1f} ms",
            file=sys.stderr,
        )

    speedups = [s / m for s, m in rows.values() if m > 0]
    print(json.dumps({
        "metric": "mesh_bench_median_speedup",
        "value": round(float(np.median(speedups)), 3),
        "unit": f"x_single_device_{n_dev}dev",
        "vs_baseline": round(float(np.median(speedups)), 3),
    }))
    return 0


def _probe_accelerator(timeout_s: float = 120, env: dict = None) -> dict:
    """One killable-subprocess backend probe; returns a history record."""
    import subprocess

    t0 = time.time()
    try:
        r = subprocess.run(
            [
                sys.executable,
                "-c",
                "import jax.numpy as jnp; "
                "jnp.ones(4).sum().block_until_ready(); "
                "import jax, sys; sys.stdout.write(jax.default_backend())",
            ],
            timeout=timeout_s,
            capture_output=True,
            env=env,
        )
        backend = r.stdout.decode(errors="replace").strip()
        # ok = JAX came up at all; a healthy CPU-only host passes immediately
        # (main() routes it to the host-packed bench) -- only a hung/dead
        # plugin init is a failure.  Callers that specifically need an
        # accelerator also check the recorded backend.
        ok = r.returncode == 0 and backend != ""
    except subprocess.TimeoutExpired:
        ok, backend = False, "timeout"
    return {"ok": ok, "backend": backend, "secs": round(time.time() - t0, 1)}


def _record_probe(rec: dict) -> None:
    hist = []
    try:
        hist = json.loads(os.environ.get("_SYMMER_BENCH_PROBES", "[]"))
    except ValueError:
        pass
    hist.append(rec)
    os.environ["_SYMMER_BENCH_PROBES"] = json.dumps(hist)


def _ensure_live_backend():
    """The remote-TPU tunnel can go down between runs, and a dead PJRT
    plugin makes the first backend initialisation hang forever (no error).
    Probe it in a KILLABLE subprocess with RETRIES (a transient outage must
    not forfeit a round's TPU record); on persistent failure re-exec on the
    CPU backend with a clean PYTHONPATH (dropping the sitecustomize hook
    that pins the plugin) so the bench always produces an artifact — the
    emitted JSON records the backend, probe history, and an explicit
    tpu_unreachable flag."""
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return
    if os.environ.get("_SYMMER_BENCH_REEXEC"):
        return
    attempts = int(os.environ.get("SYMMER_BENCH_PROBE_ATTEMPTS", "3"))
    backoff = float(os.environ.get("SYMMER_BENCH_PROBE_BACKOFF_S", "20"))
    for i in range(attempts):
        rec = _probe_accelerator()
        _record_probe(rec)
        if rec["ok"]:
            return
        print(
            f"# accelerator probe {i + 1}/{attempts} failed ({rec})",
            file=sys.stderr,
        )
        if i + 1 < attempts:
            time.sleep(backoff * (i + 1))
    print(
        "# accelerator backend unreachable -- falling back to CPU",
        file=sys.stderr,
    )
    env = dict(os.environ)
    # drop only the entries that hook the dead plugin in (sitecustomize
    # dirs); keep any other PYTHONPATH-provided dependencies.  The original
    # PYTHONPATH is preserved so a late re-probe can still reach the plugin.
    env["_SYMMER_BENCH_ORIG_PYTHONPATH"] = env.get("PYTHONPATH", "")
    kept = [
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and not os.path.exists(os.path.join(p, "sitecustomize.py"))
    ]
    repo = os.path.dirname(os.path.abspath(__file__))
    env["PYTHONPATH"] = os.pathsep.join([repo] + kept)
    env["JAX_PLATFORMS"] = "cpu"
    env["_SYMMER_BENCH_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def _late_tpu_retry():
    """Called after the CPU-fallback sections complete, BEFORE the JSON is
    emitted: if the tunnel has come back, re-exec the whole bench on the
    accelerator so the round's artifact carries TPU numbers after all
    (bounded to one retry).  The CPU section results are discarded -- the
    stdout JSON must describe one coherent run."""
    if not os.environ.get("_SYMMER_BENCH_REEXEC"):
        return  # not a fallback run (user asked for CPU explicitly)
    if os.environ.get("_SYMMER_BENCH_TPU_RETRY"):
        return
    env = dict(os.environ)
    env["PYTHONPATH"] = env.pop("_SYMMER_BENCH_ORIG_PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    env.pop("_SYMMER_BENCH_REEXEC", None)
    rec = _probe_accelerator(timeout_s=90, env=env)
    rec["late"] = True
    _record_probe(rec)
    if not rec["ok"] or rec["backend"] in ("", "cpu"):
        return  # tunnel still down (or this host simply has no accelerator)
    print(
        "# accelerator came back after CPU sections -- re-running on it",
        file=sys.stderr,
    )
    env["_SYMMER_BENCH_PROBES"] = os.environ["_SYMMER_BENCH_PROBES"]
    env["_SYMMER_BENCH_TPU_RETRY"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


if __name__ == "__main__":
    _ensure_live_backend()
    if "--check" in sys.argv:
        sys.exit(check())
    if "--fuzz" in sys.argv:
        sys.exit(fuzz())
    if "--sweep" in sys.argv:
        sys.exit(sweep())
    if "--lanczos" in sys.argv:
        sys.exit(lanczos_bench())
    if "--mesh" in sys.argv:
        sys.exit(mesh_bench())
    main()
