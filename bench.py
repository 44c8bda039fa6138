"""Benchmark: canonical stencils on the attached accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Primary metric: hdiff gridpoints/s at 256x256x80 (float32), the reference's
canonical perf workload (BASELINE.md). ``vs_baseline`` is the achieved
fraction of the chip's HBM roofline (minimal-traffic model: hdiff moves
3 fields x 4 B per gridpoint) divided by the 0.80 target — >= 1.0 means the
driver-set target is met.

Timing methodology: the TPU may sit behind an async tunnel where
``block_until_ready`` does not block and identical (executable, input)
executions can be served from a cache. Each measurement therefore uses a
FRESH random input, iterates the stencil step on-device inside one jitted
``lax.fori_loop`` (steps chained through the data so nothing can be elided),
synchronizes by fetching a scalar, and reports (T(n_hi) - T(n_lo)) /
(n_hi - n_lo) to cancel the constant dispatch/transfer overhead. The
tunnel's constant overhead is ~25ms with +-3ms jitter, so the two chain
lengths are 202/3202: a 3000-step window keeps the fit noise under
~1us/step (202-step windows measured +-25us/step — useless; 1000-step
windows still drifted +-2.5us/step run-to-run).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _peak_hbm_bytes_per_s(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    table = {
        "v5 lite": 819e9,  # v5e
        "v5e": 819e9,
        "v5p": 2765e9,
        "v5": 2765e9,
        "v4": 1228e9,
        "v6 lite": 1638e9,  # Trillium
        "v6e": 1638e9,
        "v3": 900e9,
        "v2": 700e9,
    }
    for key, bw in table.items():
        if key in kind:
            return bw
    return float("nan")


# Module-level so the frontend can resolve the string annotations.
Field3F = None
FieldVadv = "vadv_dt"  # resolved via the dtypes={} option


def _define_hdiff32(dtype=np.float32, name="hdiff32"):
    from gt4py_tpu.cartesian import gtscript

    global Field3F
    Field3F = gtscript.Field[dtype]

    def hdiff32(in_field: "Field3F", out_field: "Field3F", coeff: "Field3F"):
        with gtscript.computation("PARALLEL"), gtscript.interval(...):
            lap_field = 4.0 * in_field[0, 0, 0] - (
                in_field[1, 0, 0] + in_field[-1, 0, 0] + in_field[0, 1, 0] + in_field[0, -1, 0]
            )
            res = lap_field[1, 0, 0] - lap_field[0, 0, 0]
            flx_field = 0.0 if (res * (in_field[1, 0, 0] - in_field[0, 0, 0])) > 0 else res
            res = lap_field[0, 1, 0] - lap_field[0, 0, 0]
            fly_field = 0.0 if (res * (in_field[0, 1, 0] - in_field[0, 0, 0])) > 0 else res
            out_field = in_field[0, 0, 0] - coeff[0, 0, 0] * (
                flx_field[0, 0, 0] - flx_field[-1, 0, 0] + fly_field[0, 0, 0] - fly_field[0, -1, 0]
            )

    hdiff32.__name__ = name
    return hdiff32


_rand_seed = [0]


def device_random(shape, dtype=np.float32, offset=0.0):
    """Fresh on-device random array (new key per call). Bulk host->device
    uploads through the remote tunnel cost ~1-2s per 21MB array and
    dominated the bench wall time; only a 4-byte seed crosses now."""
    import jax

    _rand_seed[0] += 1
    out = jax.random.uniform(jax.random.PRNGKey(_rand_seed[0]), shape, dtype=dtype)
    return out + offset if offset else out


class StepTimer:
    """Per-step device time via chained on-device iteration + two-point fit."""

    def __init__(self):
        import jax

        self.fetch = jax.jit(lambda a: a.ravel()[0])
        #: label -> compile+warm seconds of the last measure() call
        self.compile_times: dict = {}
        #: label -> (median-fit - min-fit)/min-fit in percent (noise bar)
        self.spread_pct: dict = {}

    def sync(self, x) -> None:
        np.asarray(self.fetch(x))

    def measure(
        self, make_chained, fresh_inputs, n_lo=202, n_hi=3202, trials=6, label=""
    ) -> float:
        """make_chained(n) -> jitted fn(*inputs) running n chained steps.
        fresh_inputs() -> tuple of device arrays (new values each call).
        Wall-time per phase goes to stderr (budget diagnostics).
        Records per-label run-to-run spread (min-fit vs median-fit, %) in
        ``self.spread_pct`` so a 1% wobble in a headline metric is
        attributable to noise rather than a regression."""
        wall0 = time.perf_counter()
        if not label:
            label = getattr(make_chained, "__name__", "workload").removeprefix("make_")
        f_lo = make_chained(n_lo)
        f_hi = make_chained(n_hi)

        def timed(fn):
            args = fresh_inputs()
            for a in args:
                self.sync(a)
            t0 = time.perf_counter()
            r = fn(*args)
            self.sync(r[0] if isinstance(r, tuple) else r)
            return time.perf_counter() - t0

        timed(f_lo)  # warm compile + cache paths
        warm_done = time.perf_counter()
        self.compile_times[label] = round(warm_done - wall0, 1)
        timed(f_hi)
        los = sorted(timed(f_lo) for _ in range(trials))
        his = sorted(timed(f_hi) for _ in range(trials))
        lo, hi = los[0], his[0]
        est = (hi - lo) / (n_hi - n_lo)
        est_med = (his[len(his) // 2] - los[len(los) // 2]) / (n_hi - n_lo)
        if est > 0:
            self.spread_pct[label] = round((est_med - est) / est * 100, 1)
        print(
            f"[bench] {label or 'workload'}: compile+warm "
            f"{warm_done - wall0:.1f}s, measure "
            f"{time.perf_counter() - warm_done:.1f}s",
            file=sys.stderr,
        )
        # Dispatch jitter can exceed the lo-run runtime and push the fit
        # negative; fall back to the amortized upper bound (slightly
        # pessimistic: includes one dispatch + the encode prologue).
        upper = hi / n_hi
        if est <= 0 or est > upper:
            est = upper
        return est


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    sys.path.insert(0, ".")
    from gt4py_tpu.cartesian import gtscript
    from gt4py_tpu.cartesian.caching import enable_persistent_cache

    enable_persistent_cache()  # XLA executables survive across bench runs
    from gt4py_tpu.cartesian.backend.evaluator import Evaluator
    from gt4py_tpu.cartesian.backend.pallas_codegen import build_pallas_fn
    from tests.cartesian_tests import stencil_defs as defs

    dev = jax.devices()[0]
    on_tpu = jax.default_backend() == "tpu"
    peak_bw = _peak_hbm_bytes_per_s(dev)
    timer = StepTimer()
    results: dict = {}

    ni, nj, nk = 256, 256, 80
    halo = 2
    shape = (ni + 2 * halo, nj + 2 * halo, nk)
    domain = (ni, nj, nk)
    points = ni * nj * nk
    rng = np.random.default_rng(0)

    # --- hdiff (Pallas plane kernel, chained in native (K, I, J) layout) ---
    s32 = dict(literal_float_precision=32, literal_int_precision=32)
    st = gtscript.stencil(backend="jax", definition=_define_hdiff32(), **s32)
    analyzed = st._analyzed
    origins = {n: (halo, halo, 0) for n in ("in_field", "out_field", "coeff")}

    pallas_fn = None
    if on_tpu:
        try:
            pallas_fn = build_pallas_fn(analyzed, domain, origins)
            if not hasattr(pallas_fn, "call_padded"):
                pallas_fn = None  # tiled strategy: no native-layout API
        except Exception:
            pallas_fn = None

    def hdiff_step(in_field, coeff, out_field):
        ev = Evaluator(
            analyzed, domain, origins,
            {"in_field": in_field, "coeff": coeff, "out_field": out_field},
            {}, ns="jax",
        )
        return ev.run()["out_field"]

    # One compile per workload: the chain length is a TRACED fori_loop
    # bound, so the lo/hi measurement points share an executable (the
    # remote-tunnel Mosaic/XLA compile is the dominant bench cost).
    _hdiff_jit: list = []

    def make_hdiff(n):
        if not _hdiff_jit:
            if pallas_fn is not None:
                # Unrolled x2 so each ping-pong buffer returns to its own
                # while-loop tuple slot: XLA cannot swap buffers between
                # slots, and the 1-step body paid a 21.6 MB VMEM copy +
                # three strip copies per iteration (11 us of the 97.5;
                # 86.8 us/step unrolled, measured v5e).
                @jax.jit
                def f(n, inp, coeff):
                    pin = pallas_fn.encode("in_field", inp)
                    pco = pallas_fn.encode("coeff", coeff)
                    def body2(i, carry):
                        a, b = carry
                        r1 = pallas_fn.call_padded(
                            {"in_field": a, "coeff": pco, "out_field": b}, {}
                        )["out_field"]
                        r2 = pallas_fn.call_padded(
                            {"in_field": r1, "coeff": pco, "out_field": a}, {}
                        )["out_field"]
                        return (r2, r1)
                    zero = jax.tree_util.tree_map(jnp.zeros_like, pin)
                    a, _ = lax.fori_loop(0, n // 2, body2, (pin, zero))
                    return a
            else:
                @jax.jit
                def f(n, inp, coeff):
                    def body(i, carry):
                        a, b = carry
                        new = hdiff_step(a, coeff, b)
                        return (new, a)
                    a, _ = lax.fori_loop(0, n, body, (inp, jnp.zeros_like(inp)))
                    return a
            _hdiff_jit.append(f)
        f = _hdiff_jit[0]
        return lambda *args: f(n, *args)

    t_hdiff = timer.measure(
        make_hdiff,
        lambda: (device_random(shape), device_random(shape)),
    )
    hdiff_gps = points / t_hdiff
    # Minimal semantic traffic: in_field must be read over the domain PLUS
    # its 2-point halo footprint (those values enter the answer); coeff and
    # out cover the domain only. f32.
    hdiff_bytes = ((ni + 2 * halo) * (nj + 2 * halo) + 2 * ni * nj) * nk * 4
    hdiff_frac = (hdiff_bytes / t_hdiff) / peak_bw if peak_bw == peak_bw else float("nan")
    results["hdiff_Ggps"] = round(hdiff_gps / 1e9, 3)
    results["hdiff_us_per_step"] = round(t_hdiff * 1e6, 1)
    results["hdiff_roofline_frac"] = (
        round(hdiff_frac, 3) if hdiff_frac == hdiff_frac else None
    )

    # --- hdiff in bfloat16 (half the HBM traffic; 16-bit lanes pack 2x) ---
    try:
        from gt4py_tpu.core.definitions import bfloat16

        st_bf = gtscript.stencil(
            backend="jax",
            definition=_define_hdiff32(bfloat16, name="hdiff_bf16"),
            name="hdiff_bf16",
            **s32,
        )
        an_bf = st_bf._analyzed

        pallas_bf = None
        if on_tpu:
            try:
                pallas_bf = build_pallas_fn(an_bf, domain, origins)
                if not hasattr(pallas_bf, "call_padded"):
                    pallas_bf = None
            except Exception:
                pallas_bf = None

        def hdiff_bf_step(in_field, coeff, out_field):
            ev = Evaluator(
                an_bf, domain, origins,
                {"in_field": in_field, "coeff": coeff, "out_field": out_field},
                {}, ns="jax",
            )
            return ev.run()["out_field"]

        _bf_jit: list = []

        def make_hdiff_bf16(n):
            if not _bf_jit:
                if pallas_bf is not None:
                    # unrolled x2: see make_hdiff (slot-stable ping-pong)
                    @jax.jit
                    def f(n, inp, coeff):
                        pin = pallas_bf.encode("in_field", inp)
                        pco = pallas_bf.encode("coeff", coeff)

                        def body2(i, carry):
                            a, b = carry
                            r1 = pallas_bf.call_padded(
                                {"in_field": a, "coeff": pco, "out_field": b}, {}
                            )["out_field"]
                            r2 = pallas_bf.call_padded(
                                {"in_field": r1, "coeff": pco, "out_field": a}, {}
                            )["out_field"]
                            return (r2, r1)

                        zero = jax.tree_util.tree_map(jnp.zeros_like, pin)
                        a, _ = lax.fori_loop(0, n // 2, body2, (pin, zero))
                        return a
                else:
                    @jax.jit
                    def f(n, inp, coeff):
                        def body(i, carry):
                            a, b = carry
                            new = hdiff_bf_step(a, coeff, b)
                            return (new, a)

                        a, _ = lax.fori_loop(0, n, body, (inp, jnp.zeros_like(inp)))
                        return a
                _bf_jit.append(f)
            f = _bf_jit[0]
            return lambda *args: f(n, *args)

        t_bf = timer.measure(
            make_hdiff_bf16,
            lambda: (
                device_random(shape, dtype=jnp.bfloat16),
                device_random(shape, dtype=jnp.bfloat16),
            ),
        )
        bf_bytes = ((ni + 2 * halo) * (nj + 2 * halo) + 2 * ni * nj) * nk * 2
        bf_frac = (bf_bytes / t_bf) / peak_bw if peak_bw == peak_bw else float("nan")
        results["hdiff_bf16_Ggps"] = round(points / t_bf / 1e9, 3)
        results["hdiff_bf16_us_per_step"] = round(t_bf * 1e6, 1)
        results["hdiff_bf16_roofline_frac"] = (
            round(bf_frac, 3) if bf_frac == bf_frac else None
        )
        results["hdiff_bf16_vs_f32_speedup"] = round(t_hdiff / t_bf, 2)
    except Exception as e:
        results["hdiff_bf16_error"] = f"{type(e).__name__}: {e}"[:200]

    # --- vadv (float32 on TPU: f64 division is emulated and Mosaic has no
    # 64-bit types; the canonical f64 definition is correctness-tested in
    # tests/) --------------------------------------------------------------
    try:
        st2 = gtscript.stencil(
            backend="jax",
            definition=defs.vertical_advection_dycore_generic,
            externals=defs.VADV_EXTERNALS,
            dtypes={"vadv_dt": np.float32},
            literal_float_precision=32,
            literal_int_precision=32,
            name="vadv_bench",
        )
        vshape = (ni, nj, nk)
        vdomain = (ni - 1, nj, nk)
        vorigins = {
            n: (0, 0, 0)
            for n in ("utens_stage", "u_stage", "wcon", "u_pos", "utens")
        }

        vadv_pallas = None
        if on_tpu:
            try:
                vadv_pallas = build_pallas_fn(st2._analyzed, vdomain, vorigins)
            except Exception:
                vadv_pallas = None

        def vadv_step(utens_stage, u_stage, wcon, u_pos, utens):
            arrays = {
                "utens_stage": utens_stage, "u_stage": u_stage,
                "wcon": wcon, "u_pos": u_pos, "utens": utens,
            }
            scalars = {"dtr_stage": np.float32(0.15)}
            if vadv_pallas is not None:
                return vadv_pallas(arrays, scalars)["utens_stage"]
            ev = Evaluator(
                st2._analyzed, vdomain, vorigins, arrays, scalars, ns="jax",
            )
            return ev.run()["utens_stage"]

        vadv_names = ("utens_stage", "u_stage", "wcon", "u_pos", "utens")

        _vadv_jit: list = []

        if vadv_pallas is not None and hasattr(vadv_pallas, "call_padded"):
            # Staged plane kernels chained in native (K, I, J) layout.
            # The chain takes PRE-ENCODED padded buffers as jit
            # parameters (steady-state stepping — the layout real dycore
            # drivers hold between steps via the storage native cache):
            # with the encodes inside the jit the transposed invariants
            # become loop intermediates and XLA parks a different subset
            # of the 8x21 MB working set in VMEM, measuring 202 us/step
            # vs 130 for identical per-step math (v5e, profiled).
            _vadv_enc = jax.jit(
                lambda *arrs: tuple(
                    vadv_pallas.encode(m, a) for m, a in zip(vadv_names, arrs)
                )
            )

            def _vadv_fresh():
                return tuple(
                    jax.device_put(x)
                    for x in _vadv_enc(*(device_random(vshape) for _ in range(5)))
                )

            def make_vadv(n):
                if not _vadv_jit:
                    @jax.jit
                    def f(n, p_uts, p_ust, p_wcon, p_upos, p_utens):
                        state = dict(
                            zip(vadv_names, (p_uts, p_ust, p_wcon, p_upos, p_utens))
                        )
                        # chain-major J-split stepping: per-part working
                        # sets stay VMEM-resident (pallas_seq.chain_padded)
                        return vadv_pallas.chain_padded(
                            state, {"dtr_stage": np.float32(0.15)}, n
                        )["utens_stage"]
                    _vadv_jit.append(f)
                f = _vadv_jit[0]
                return lambda *args: f(n, *args)
        else:
            def _vadv_fresh():
                return tuple(device_random(vshape) for _ in range(5))

            def make_vadv(n):
                if not _vadv_jit:
                    @jax.jit
                    def f(n, utens_stage, u_stage, wcon, u_pos, utens):
                        def body(i, us):
                            return vadv_step(us, u_stage, wcon, u_pos, utens)
                        return lax.fori_loop(0, n, body, utens_stage)
                    _vadv_jit.append(f)
                f = _vadv_jit[0]
                return lambda *args: f(n, *args)

        t_vadv = timer.measure(make_vadv, _vadv_fresh, label="vadv")
        vpoints = (ni - 1) * nj * nk
        results["vadv_Ggps"] = round(vpoints / t_vadv / 1e9, 3)
        results["vadv_us_per_step"] = round(t_vadv * 1e6, 1)
        vadv_bytes = 6 * vpoints * 4  # 5 reads + 1 write, f32
        vfrac = (vadv_bytes / t_vadv) / peak_bw if peak_bw == peak_bw else float("nan")
        results["vadv_roofline_frac"] = round(vfrac, 3) if vfrac == vfrac else None
    except Exception as e:  # keep the primary metric alive
        results["vadv_error"] = f"{type(e).__name__}: {e}"[:200]

    # --- tridiagonal solve (forward+backward K, staged plane kernels) -----
    try:
        from gt4py_tpu.cartesian.gtscript import computation, interval

        def tri32(inf, diag, sup, rhs, out):
            # Thomas algorithm with the modified coefficients in TEMPORARIES
            # (cp/dp live in VMEM carry rings): semantic traffic is exactly
            # 4 reads + 1 write, matching the roofline model below. The
            # in-place (inout sup/rhs) variant is correctness-tested in
            # tests/; it moves 7 streams and is the wrong benchmark shape.
            with computation("FORWARD"):
                with interval(0, 1):
                    cp = sup / diag
                    dp = rhs / diag
                with interval(1, None):
                    cp = sup / (diag - cp[0, 0, -1] * inf)
                    dp = (rhs - inf * dp[0, 0, -1]) / (diag - cp[0, 0, -1] * inf)
            with computation("BACKWARD"):
                with interval(-1, None):
                    out = dp
                with interval(0, -1):
                    out = dp - cp * out[0, 0, 1]

        F32 = gtscript.Field[np.float32]
        tri32.__annotations__ = {k: F32 for k in ("inf", "diag", "sup", "rhs", "out")}
        st3 = gtscript.stencil(
            backend="jax", definition=tri32, literal_float_precision=32,
            name="tridiag_bench",
        )
        tshape = (ni, nj, nk)
        tdomain = tshape
        torigins = {n: (0, 0, 0) for n in ("inf", "diag", "sup", "rhs", "out")}
        tri_pallas = None
        if on_tpu:
            try:
                tri_pallas = build_pallas_fn(st3._analyzed, tdomain, torigins)
            except Exception:
                tri_pallas = None

        _tri_jit: list = []

        def make_tri(n):
            if _tri_jit:
                f = _tri_jit[0]
                return lambda *args: f(n, *args)

            @jax.jit
            def f(n, inf, diag, sup, rhs):
                if tri_pallas is not None and hasattr(tri_pallas, "chain_padded"):
                    p = {
                        "inf": tri_pallas.encode("inf", inf),
                        "diag": tri_pallas.encode("diag", diag),
                        "sup": tri_pallas.encode("sup", sup),
                        "rhs": tri_pallas.encode("rhs", rhs),
                        "out": tri_pallas.encode("out", jnp.zeros_like(rhs)),
                    }
                    # chained solves: each step's solution becomes the next
                    # right-hand side (chain-major J-split keeps per-part
                    # working sets VMEM-resident)
                    return tri_pallas.chain_padded(
                        p, {}, n, carry_map={"rhs": "out"}
                    )["out"]
                def body(i, r):
                    ev = Evaluator(
                        st3._analyzed, tdomain, torigins,
                        {"inf": inf, "diag": diag, "sup": sup, "rhs": r,
                         "out": jnp.zeros_like(r)},
                        {}, ns="jax",
                    )
                    return ev.run()["out"]
                return lax.fori_loop(0, n, body, rhs)

            _tri_jit.append(f)
            return lambda *args: f(n, *args)

        t_tri = timer.measure(
            make_tri,
            lambda: tuple(device_random(tshape) for _ in range(4)),
        )
        tpoints = ni * nj * nk
        results["tridiag_Ggps"] = round(tpoints / t_tri / 1e9, 3)
        results["tridiag_us_per_step"] = round(t_tri * 1e6, 1)
        # minimal semantic traffic: read inf/diag/sup/rhs, write out (f32)
        tri_bytes = 5 * tpoints * 4
        tfrac = (tri_bytes / t_tri) / peak_bw if peak_bw == peak_bw else float("nan")
        results["tridiag_roofline_frac"] = round(tfrac, 3) if tfrac == tfrac else None
    except Exception as e:
        results["tridiag_error"] = f"{type(e).__name__}: {e}"[:200]

    # --- field-view (next) workloads: hdiff + FVM nabla --------------------
    # The field-view layer executes through XLA (embedded JAX fields); these
    # entries track it against the cartesian Pallas substrate (round-1
    # verdict item 4: next hdiff vs cartesian hdiff, nabla recorded).
    try:
        import gt4py_tpu.next as gtx
        from gt4py_tpu.next import Dimension, DimensionKind, FieldOffset, where
        from gt4py_tpu.next import neighbor_sum
        from gt4py_tpu.next.embedded import offset_provider_context

        IDim = Dimension("IDim")
        JDim = Dimension("JDim")
        KDim = Dimension("KDim", kind=DimensionKind.VERTICAL)
        Ioff = FieldOffset("Ioff", source=IDim, target=(IDim,))
        Joff = FieldOffset("Joff", source=JDim, target=(JDim,))
        providers = {"Ioff": IDim, "Joff": JDim}

        @gtx.field_operator
        def next_hdiff(inp, coeff):
            lap = 4.0 * inp - (
                inp(Ioff[1]) + inp(Ioff[-1]) + inp(Joff[1]) + inp(Joff[-1])
            )
            res1 = lap(Ioff[1]) - lap
            flx = where(res1 * (inp(Ioff[1]) - inp) > 0.0, 0.0, res1)
            res2 = lap(Joff[1]) - lap
            fly = where(res2 * (inp(Joff[1]) - inp) > 0.0, 0.0, res2)
            return inp - coeff * (
                flx - flx(Ioff[-1]) + fly - fly(Joff[-1])
            )

        hshape = (ni + 2 * halo, nj + 2 * halo, nk)

        # Warm one call through the public field-operator API so the
        # cartesian bridge traces+compiles (next/cartesian_bridge.py), then
        # time the SAME kernels chained in native layout (the cartesian
        # hdiff methodology, so the ratio is apples-to-apples).
        op = next_hdiff.with_backend("tpu:pallas")
        h_np = rng.random(hshape, dtype=np.float32)
        c_np = rng.random(hshape, dtype=np.float32)
        fin = gtx.as_field([IDim, JDim, KDim], h_np)
        fco = gtx.as_field([IDim, JDim, KDim], c_np)
        fout = gtx.zeros(
            {IDim: (halo, halo + ni), JDim: (halo, halo + nj), KDim: nk},
            dtype=np.float32,
        )
        op(fin, fco, out=fout, offset_provider=providers)
        variant = next(v for v in op._bridge_cache.values() if v is not None)
        banalyzed = variant.backend.analyzed
        # halo'd out geometry (like the cartesian bench) so steps chain
        borigins = {
            "inp": (halo, halo, 0),
            "coeff": (halo, halo, 0),
            variant.out_name: (halo, halo, 0),
        }
        bridged_fn = None
        if on_tpu:
            try:
                bridged_fn = build_pallas_fn(banalyzed, domain, borigins)
                if not hasattr(bridged_fn, "call_padded"):
                    bridged_fn = None
            except Exception:
                bridged_fn = None

        _nh_jit: list = []
        if bridged_fn is not None:
            out_name = variant.out_name

            def make_next_hdiff(n):
                if not _nh_jit:
                    # unrolled x2: see make_hdiff (slot-stable ping-pong)
                    @jax.jit
                    def f(n, inp, coeff):
                        pin = bridged_fn.encode("inp", inp)
                        pco = bridged_fn.encode("coeff", coeff)
                        zero = jax.tree_util.tree_map(jnp.zeros_like, pin)

                        def body2(i, carry):
                            a, o = carry
                            r1 = bridged_fn.call_padded(
                                {"inp": a, "coeff": pco, out_name: o}, {}
                            )[out_name]
                            r2 = bridged_fn.call_padded(
                                {"inp": r1, "coeff": pco, out_name: a}, {}
                            )[out_name]
                            return (r2, r1)

                        o, _ = lax.fori_loop(0, n // 2, body2, (pin, zero))
                        return o

                    _nh_jit.append(f)
                f = _nh_jit[0]
                return lambda *args: f(n, *args)
        else:

            def make_next_hdiff(n):
                if not _nh_jit:
                    @jax.jit
                    def f(n, inp, coeff):
                        with offset_provider_context(providers):
                            fco2 = gtx.as_field([IDim, JDim, KDim], coeff)

                            def body(i, carry):
                                a, b = carry
                                fin2 = gtx.as_field([IDim, JDim, KDim], a)
                                res = next_hdiff.definition(fin2, fco2)
                                new = b.at[halo:-halo, halo:-halo, :].set(
                                    jnp.asarray(res.ndarray)
                                )
                                return (new, a)

                            a, _ = lax.fori_loop(0, n, body, (inp, jnp.zeros_like(inp)))
                            return a

                    _nh_jit.append(f)
                f = _nh_jit[0]
                return lambda *args: f(n, *args)

        t_nh = timer.measure(
            make_next_hdiff,
            lambda: (device_random(hshape), device_random(hshape)),
        )
        results["next_hdiff_us_per_step"] = round(t_nh * 1e6, 1)
        results["next_hdiff_vs_cartesian"] = round(t_nh / t_hdiff, 2)
        results["next_hdiff_bridged"] = bridged_fn is not None

        # FVM nabla on a periodic quad mesh (unstructured gather + neighbor
        # reduction; reference test_fvm_nabla workload).
        import sys as _sys

        _sys.path.insert(0, ".")
        from tests.next_tests.test_field_ops import make_periodic_mesh

        V = Dimension("Vertex")
        E = Dimension("Edge")
        V2EDim = Dimension("V2E", kind=DimensionKind.LOCAL)
        E2VDim = Dimension("E2V", kind=DimensionKind.LOCAL)
        V2E = FieldOffset("V2E", source=E, target=(V, V2EDim))
        E2V = FieldOffset("E2V", source=V, target=(E, E2VDim))

        @gtx.field_operator
        def nabla_x(pp, s_x, sign, vol):
            zavg = 0.5 * (pp(E2V[0]) + pp(E2V[1])) * s_x
            return neighbor_sum(zavg(V2E) * sign, axis=V2EDim) / vol

        nmesh = 256
        e2v_np, v2e_np, signs_np = make_periodic_mesh(nmesh)
        nv = nmesh * nmesh
        e2v = gtx.as_connectivity([E, E2VDim], V, e2v_np)
        v2e = gtx.as_connectivity([V, V2EDim], E, v2e_np)
        nprov = {"E2V": e2v, "V2E": v2e}
        sign_f = gtx.as_field([V, V2EDim], signs_np.astype(np.float32))

        _nb_jit: list = []

        def make_nabla(n):
            if not _nb_jit:
                @jax.jit
                def f(n, pp, sx, vol):
                    with offset_provider_context(nprov):
                        fsx = gtx.as_field([E], sx)
                        fvol = gtx.as_field([V], vol)

                        def body(i, p):
                            fp = gtx.as_field([V], p)
                            res = nabla_x.definition(fp, fsx, sign_f, fvol)
                            return jnp.asarray(res.ndarray)

                        return lax.fori_loop(0, n, body, pp)

                _nb_jit.append(f)
            f = _nb_jit[0]
            return lambda *args: f(n, *args)

        # Structured mesh: the shift-decomposition fast path (embedded.py
        # _shift_plan) turns every gather into rolls + masked selects —
        # bandwidth-bound, so the full 202/3202 chain methodology applies.
        from gt4py_tpu.next.embedded import _shift_plan

        structured = all(
            _shift_plan(c, col, 0, n_codom) is not None
            for c, n_codom in ((e2v, nv), (v2e, 2 * nv))
            for col in range(c.table.shape[1])
        )
        t_nb = timer.measure(
            make_nabla,
            lambda: (
                device_random((nv,)),
                device_random((2 * nv,)),
                device_random((nv,), offset=0.5),
            ),
        )
        results["fvm_nabla_us_per_step"] = round(t_nb * 1e6, 1)
        results["fvm_nabla_Mvertices_s"] = round(nv / t_nb / 1e6, 1)
        results["fvm_nabla_structured"] = structured
        # Minimal semantic streaming traffic: pp + sx + sign(4/vertex) +
        # vol reads + out write, f32.
        nb_bytes = (nv + 2 * nv + 4 * nv + nv + nv) * 4
        nb_frac = (nb_bytes / t_nb) / peak_bw if peak_bw == peak_bw else float("nan")
        results["fvm_nabla_stream_frac"] = (
            round(nb_frac, 3) if nb_frac == nb_frac else None
        )

        # IRREGULAR mesh (randomly renumbered vertices/edges): no shift
        # structure survives, so this measures the row-gather path and its
        # ceiling. Model: ~2.3 ns per gathered row on v5e (measured,
        # W-independent); rows/step = 2 E2V gathers of ne + 4 V2E gathers
        # of nv.
        perm_v = np.random.default_rng(3).permutation(nv)
        perm_e = np.random.default_rng(4).permutation(2 * nv)
        inv_v = np.argsort(perm_v)
        inv_e = np.argsort(perm_e)
        # vertex v in the old numbering is perm_v[v] in the new one
        e2v_ir = perm_v[e2v_np][inv_e]
        v2e_ir = perm_e[v2e_np][inv_v]
        sign_ir = signs_np[inv_v]
        e2v_i = gtx.as_connectivity([E, E2VDim], V, e2v_ir)
        v2e_i = gtx.as_connectivity([V, V2EDim], E, v2e_ir)
        iprov = {"E2V": e2v_i, "V2E": v2e_i}
        sign_if = gtx.as_field([V, V2EDim], sign_ir.astype(np.float32))

        _nbi_jit: list = []

        def make_nabla_irreg(n):
            if not _nbi_jit:
                @jax.jit
                def f(n, pp, sx, vol):
                    with offset_provider_context(iprov):
                        fsx = gtx.as_field([E], sx)
                        fvol = gtx.as_field([V], vol)

                        def body(i, p):
                            fp = gtx.as_field([V], p)
                            res = nabla_x.definition(fp, fsx, sign_if, fvol)
                            return jnp.asarray(res.ndarray)

                        return lax.fori_loop(0, n, body, pp)

                _nbi_jit.append(f)
            f = _nbi_jit[0]
            return lambda *args: f(n, *args)

        t_nbi = timer.measure(
            make_nabla_irreg,
            lambda: (
                device_random((nv,)),
                device_random((2 * nv,)),
                device_random((nv,), offset=0.5),
            ),
            n_lo=2, n_hi=102,  # ~1.4ms/step: jitter <2%
        )
        results["fvm_nabla_irregular_us_per_step"] = round(t_nbi * 1e6, 1)
        gathered_rows = 2 * (2 * nv) + 4 * nv
        t_gather_model = gathered_rows * 2.3e-9
        gfrac = t_gather_model / t_nbi if t_nbi > 0 else float("nan")
        results["fvm_nabla_irregular_gather_ceiling_frac"] = (
            round(gfrac, 3) if gfrac == gfrac else None
        )

        # PERTURBED mesh (structured + ~2% arbitrary rewires per column —
        # the mostly-structured case of real limited-area meshes): the
        # hybrid shift plan keeps the rolls for the majority rows and
        # fixes the rewired rows up with a sparse row-gather + scatter,
        # instead of paying the full per-row gather rate for everything.
        prng = np.random.default_rng(7)
        e2v_pt = e2v_np.copy()
        v2e_pt = v2e_np.copy()
        for tbl, codom in ((e2v_pt, nv), (v2e_pt, 2 * nv)):
            n_rows = tbl.shape[0]
            n_bad = max(1, int(0.02 * n_rows))
            for col in range(tbl.shape[1]):
                rows = prng.choice(n_rows, size=n_bad, replace=False)
                tbl[rows, col] = prng.integers(0, codom, size=n_bad)
        e2v_p = gtx.as_connectivity([E, E2VDim], V, e2v_pt)
        v2e_p = gtx.as_connectivity([V, V2EDim], E, v2e_pt)
        pprov = {"E2V": e2v_p, "V2E": v2e_p}
        hybrid = all(
            (pl := _shift_plan(c, col, 0, n_codom)) is not None
            and pl.res_rows is not None
            for c, n_codom in ((e2v_p, nv), (v2e_p, 2 * nv))
            for col in range(c.table.shape[1])
        )

        _nbp_jit: list = []

        def make_nabla_pert(n):
            if not _nbp_jit:
                @jax.jit
                def f(n, pp, sx, vol):
                    with offset_provider_context(pprov):
                        fsx = gtx.as_field([E], sx)
                        fvol = gtx.as_field([V], vol)

                        def body(i, p):
                            fp = gtx.as_field([V], p)
                            res = nabla_x.definition(fp, fsx, sign_f, fvol)
                            return jnp.asarray(res.ndarray)

                        return lax.fori_loop(0, n, body, pp)

                _nbp_jit.append(f)
            f = _nbp_jit[0]
            return lambda *args: f(n, *args)

        t_nbp = timer.measure(
            make_nabla_pert,
            lambda: (
                device_random((nv,)),
                device_random((2 * nv,)),
                device_random((nv,), offset=0.5),
            ),
            # ~107us/step: 102-step chains (~11ms) left the fit inside
            # dispatch jitter (spread bars of tens of %); 402 spans ~43ms
            n_lo=20, n_hi=402,
        )
        results["fvm_nabla_perturbed_us_per_step"] = round(t_nbp * 1e6, 1)
        results["fvm_nabla_perturbed_hybrid"] = hybrid
        results["fvm_nabla_perturbed_vs_structured"] = (
            round(t_nbp / t_nb, 2) if t_nb > 0 else None
        )
        results["fvm_nabla_perturbed_vs_irregular"] = (
            round(t_nbp / t_nbi, 2) if t_nbi > 0 else None
        )

        # Measured-floor decomposition (round-5 verdict item 3): the
        # hybrid path pays, per step, a FIXED set of sparse fix-up ops —
        # e2v: 2 single-column remaps = 2 (gather + scatter); v2e: one
        # batched gather + 4 per-column scatters. Each op costs ~7 ns/row
        # + fixed dispatch (XLA TPU scatter/gather small-op floor, far
        # above the fused-roll rate). Probe one scatter and one gather at
        # the mesh's actual residual sizes; the model is
        #   structured + 6 * t_scatter + 3 * t_gather
        # and matching the measurement pins the residual cost to the op
        # COUNT, not the hybrid plan itself (docs/performance.md).
        try:
            from gt4py_tpu.next.embedded import _rowgather_1d

            ne_ = 2 * nv
            rng9 = np.random.default_rng(9)
            r_e = max(1, int(0.02 * ne_))  # e2v residual rows per column
            r_v = max(1, int(0.02 * nv))  # v2e residual rows per column
            rows_e = jnp.asarray(
                np.sort(rng9.choice(ne_, r_e, replace=False)).astype(np.int32)
            )
            idx_e = jnp.asarray(
                np.sort(rng9.choice(nv, r_e)).astype(np.int32)
            )
            idx_v2e = jnp.asarray(
                np.sort(rng9.choice(ne_, 4 * r_v)).astype(np.int32)
            )
            rows_v = [
                jnp.asarray(
                    np.sort(rng9.choice(nv, r_v, replace=False)).astype(
                        np.int32
                    )
                )
                for _ in range(4)
            ]
            _fx_jit: list = []

            flat_rows_v = jnp.asarray(
                np.concatenate(
                    [np.asarray(rows_v[c]) + c * nv for c in range(4)]
                ).astype(np.int32)
            )

            def make_fix(n):
                """One iteration = EXACTLY the perturbed step's fix-up op
                set: 2 x (gather r_e<-nv + scatter r_e->ne) for the two
                indexed e2v columns, then 1 gather 4*r_v<-ne + ONE
                concat-scatter 4*r_v into the axis-0 concatenation of the
                v2e parts (embedded._apply_batched_fixup's merged
                scatter)."""
                if not _fx_jit:
                    @jax.jit
                    def f(n, xv, xe):
                        def body(i, st):
                            v, e = st
                            for _ in range(2):  # e2v columns
                                fx = _rowgather_1d(v, idx_e)
                                e = e.at[rows_e].set(
                                    fx, unique_indices=True,
                                    indices_are_sorted=True,
                                )
                            fx2 = _rowgather_1d(e, idx_v2e)  # batched v2e
                            cat = jnp.concatenate(
                                [v, v + 1, v + 2, v + 3], axis=0
                            )
                            cat = cat.at[flat_rows_v].set(
                                fx2, unique_indices=True,
                                indices_are_sorted=True,
                            )
                            v = (
                                cat[:nv] + cat[nv : 2 * nv]
                                + cat[2 * nv : 3 * nv] + cat[3 * nv :]
                            ) * 0.25
                            return (v, e)
                        return lax.fori_loop(0, n, body, (xv, xe))[0]
                    _fx_jit.append(f)
                f = _fx_jit[0]
                return lambda *a: f(n, *a)

            t_fix = timer.measure(
                make_fix,
                lambda: (device_random((nv,)), device_random((ne_,))),
                label="fixops",
            )
            results["fixup_ops_us"] = round(t_fix * 1e6, 2)
            model = t_nb + t_fix
            results["fvm_nabla_perturbed_model_us"] = round(model * 1e6, 1)
            results["fvm_nabla_perturbed_vs_model"] = (
                round(t_nbp / model, 2) if model > 0 else None
            )
        except Exception as e:
            results["fixup_probe_error"] = f"{type(e).__name__}: {e}"[:160]

        # 1M-VERTEX structured mesh (round-5 verdict item 2): the 65k row
        # above moves ~2.4 MB/step — a latency demo, kept for overhead
        # tracking. This row is the THROUGHPUT claim: roll plans + lazy
        # neighbor parts reduce the step to a slice/concat/elementwise
        # chain XLA holds VMEM-resident across chained steps, so the
        # fraction of the semantic HBM streaming model can exceed 1.
        from gt4py_tpu.next.mesh_utils import periodic_quad_mesh

        nbig = 1024
        e2v_bn, v2e_bn, signs_bn = periodic_quad_mesh(nbig)
        nvb = nbig * nbig
        e2v_b = gtx.as_connectivity([E, E2VDim], V, e2v_bn)
        v2e_b = gtx.as_connectivity([V, V2EDim], E, v2e_bn)
        bprov = {"E2V": e2v_b, "V2E": v2e_b}
        sign_bf = gtx.as_field([V, V2EDim], signs_bn.astype(np.float32))

        _nbb_jit: list = []

        def make_nabla_1m(n):
            if not _nbb_jit:
                @jax.jit
                def f(n, pp, sx, vol):
                    with offset_provider_context(bprov):
                        fsx = gtx.as_field([E], sx)
                        fvol = gtx.as_field([V], vol)

                        def body(i, p):
                            fp = gtx.as_field([V], p)
                            res = nabla_x.definition(fp, fsx, sign_bf, fvol)
                            return jnp.asarray(res.ndarray)

                        return lax.fori_loop(0, n, body, pp)

                _nbb_jit.append(f)
            f = _nbb_jit[0]
            return lambda *args: f(n, *args)

        t_nbb = timer.measure(
            make_nabla_1m,
            lambda: (
                device_random((nvb,)),
                device_random((2 * nvb,)),
                device_random((nvb,), offset=0.5),
            ),
        )
        results["fvm_nabla_1M_us_per_step"] = round(t_nbb * 1e6, 1)
        results["fvm_nabla_1M_Mvertices_s"] = round(nvb / t_nbb / 1e6, 1)
        nbb_bytes = (nvb + 2 * nvb + 4 * nvb + nvb + nvb) * 4
        nbb_frac = (
            (nbb_bytes / t_nbb) / peak_bw if peak_bw == peak_bw else float("nan")
        )
        results["fvm_nabla_1M_stream_frac"] = (
            round(nbb_frac, 3) if nbb_frac == nbb_frac else None
        )
    except Exception as e:
        results["next_bench_error"] = f"{type(e).__name__}: {e}"[:200]

    # --- field-view scans: tridiag + vadv through the scan bridge ----------
    # scan_operator compositions lower onto the SAME staged Pallas kernels
    # as the cartesian FORWARD/BACKWARD stencils (next/cartesian_bridge.py
    # trace_scan); the *_vs_cartesian ratios track bridge overhead (target
    # <= 1.2, round-2 verdict item 2).
    try:
        import gt4py_tpu.next as gtx2
        from gt4py_tpu.next import where as nwhere

        IDim = gtx2.Dimension("IDim")
        JDim = gtx2.Dimension("JDim")
        KDim = gtx2.Dimension("KDim", kind=gtx2.DimensionKind.VERTICAL)
        Ioff2 = gtx2.FieldOffset("Ioff", source=IDim, target=(IDim,))
        Koff2 = gtx2.FieldOffset("Koff", source=KDim, target=(KDim,))
        prov_k = {"Ioff": IDim, "Koff": KDim}

        @gtx2.scan_operator(axis=KDim, forward=True, init=(0.0, 0.0))
        def _b_tri_fwd(carry, a, b, c, d):
            cp_prev, dp_prev = carry
            denom = b - a * cp_prev
            return (c / denom, (d - a * dp_prev) / denom)

        @gtx2.scan_operator(axis=KDim, forward=False, init=0.0)
        def _b_tri_bwd(x_kp1, cp, dp):
            return dp - cp * x_kp1

        @gtx2.field_operator(backend="tpu:pallas")
        def next_tridiag(a, b, c, d):
            cp, dp = _b_tri_fwd(a, b, c, d)
            return _b_tri_bwd(cp, dp)

        def field3(arr):
            return gtx2.as_field([IDim, JDim, KDim], arr)

        tshape = (ni, nj, nk)
        t_np = {
            n: rng.random(tshape, dtype=np.float32) for n in ("a", "b", "c", "d")
        }
        fout = gtx2.zeros({IDim: ni, JDim: nj, KDim: nk}, dtype=np.float32)
        next_tridiag(
            field3(t_np["a"]), field3(t_np["b"]), field3(t_np["c"]),
            field3(t_np["d"]), out=fout,
        )
        tri_var = next(
            v for v in next_tridiag._bridge_cache.values() if v is not None
        )
        ntri_fn = None
        if on_tpu:
            try:
                ntri_fn = build_pallas_fn(
                    tri_var.backend.analyzed, tshape,
                    {m: (0, 0, 0) for m in ("a", "b", "c", "d", tri_var.out_name)},
                )
                if not hasattr(ntri_fn, "call_padded"):
                    ntri_fn = None
            except Exception:
                ntri_fn = None
        if ntri_fn is not None:
            _ntri_jit: list = []

            def make_ntri(n):
                if not _ntri_jit:
                    @jax.jit
                    def f(n, a, b, c, d):
                        p = {m: ntri_fn.encode(m, v) for m, v in
                             zip(("a", "b", "c", "d"), (a, b, c, d))}
                        p[tri_var.out_name] = ntri_fn.encode(
                            tri_var.out_name, jnp.zeros_like(d)
                        )
                        # chained solves (solution -> next rhs) with
                        # chain-major J-split
                        return ntri_fn.chain_padded(
                            p, {}, n, carry_map={"d": tri_var.out_name}
                        )[tri_var.out_name]

                    _ntri_jit.append(f)
                f = _ntri_jit[0]
                return lambda *args: f(n, *args)

            t_ntri = timer.measure(
                make_ntri,
                lambda: tuple(device_random(tshape) for _ in range(4)),
            )
            results["next_tridiag_us_per_step"] = round(t_ntri * 1e6, 1)
            if "tridiag_us_per_step" in results:
                results["next_tridiag_vs_cartesian"] = round(
                    t_ntri * 1e6 / results["tridiag_us_per_step"], 2
                )
        results["next_tridiag_bridged"] = bool(
            ntri_fn is not None
            and getattr(tri_var.backend, "last_strategy", None) == "staged"
        ) if on_tpu else True
    except Exception as e:
        results["next_tridiag_error"] = f"{type(e).__name__}: {e}"[:200]

    try:
        BET_M, BET_P = 0.5, 0.5
        from gt4py_tpu.next.experimental import concat_where

        # Reference-idiomatic formulation: vertical boundary coefficients
        # via concat_where (K-interval sections), no index-field stream and
        # no per-point masks. The bridge + seq-fusion pass compile this to
        # the same 3-section FORWARD + 2-section BACKWARD stencil as the
        # hand-written cartesian vadv; the separate out field additionally
        # skips the in-out alias seed (measured 152.6us vs cartesian
        # 187us on v5e — next_vadv_vs_cartesian < 1.0 is real, not noise).
        NKC = nk

        @gtx2.scan_operator(axis=KDim, forward=True, init=(0.0, 0.0))
        def _b_vadv_fwd(carry, acol, bcol, ccol, dcol):
            ccol_m1, dcol_m1 = carry
            divided = 1.0 / (bcol - ccol_m1 * acol)
            return (ccol * divided, (dcol - dcol_m1 * acol) * divided)

        @gtx2.scan_operator(axis=KDim, forward=False, init=(0.0, 0.0))
        def _b_vadv_bwd(carry, ccol, dcol, upos, dtr):
            data_p1, _ = carry
            data = dcol - ccol * data_p1
            return (data, dtr * (data - upos))

        @gtx2.field_operator(backend="tpu:pallas")
        def next_vadv_op(utens_stage, u_stage, wcon, u_pos, utens, dtr):
            gav = -0.25 * (wcon(Ioff2[1]) + wcon)
            gcv = 0.25 * (wcon(Ioff2[1])(Koff2[1]) + wcon(Koff2[1]))
            as_ = concat_where(KDim == 0, 0.0, gav * BET_M)
            acol = concat_where(KDim == 0, 0.0, gav * BET_P)
            cs = concat_where(KDim == NKC - 1, 0.0, gcv * BET_M)
            ccol = concat_where(KDim == NKC - 1, 0.0, gcv * BET_P)
            bcol = dtr - acol - ccol
            dm1 = concat_where(KDim == 0, 0.0, u_stage(Koff2[-1]) - u_stage)
            dp1 = concat_where(KDim == NKC - 1, 0.0, u_stage(Koff2[1]) - u_stage)
            corr = (0.0 - as_) * dm1 - cs * dp1
            dcol = dtr * u_pos + utens + utens_stage + corr
            cc, dd = _b_vadv_fwd(acol, bcol, ccol, dcol)
            return _b_vadv_bwd(cc, dd, u_pos, dtr)[1]

        vshape2 = (ni, nj, nk)
        v_np = {
            n: rng.random(vshape2, dtype=np.float32)
            for n in ("utens_stage", "u_stage", "wcon", "u_pos", "utens")
        }
        vout = gtx2.zeros(
            {IDim: ni - 1, JDim: nj, KDim: nk}, dtype=np.float32
        )
        next_vadv_op(
            *(field3(v_np[n]) for n in
              ("utens_stage", "u_stage", "wcon", "u_pos", "utens")),
            np.float32(0.15),
            out=vout, offset_provider=prov_k,
        )
        vadv_var = next(
            v for v in next_vadv_op._bridge_cache.values() if v is not None
        )
        vnames = ("utens_stage", "u_stage", "wcon", "u_pos", "utens")
        nvadv_fn = None
        if on_tpu:
            try:
                nvadv_fn = build_pallas_fn(
                    vadv_var.backend.analyzed, (ni - 1, nj, nk),
                    {m: (0, 0, 0) for m in vnames + (vadv_var.out_name,)},
                )
                if not hasattr(nvadv_fn, "call_padded"):
                    nvadv_fn = None
            except Exception:
                nvadv_fn = None
        if nvadv_fn is not None:
            _nvadv_jit: list = []
            vscalars = {"dtr": np.float32(0.15)}
            _nv_enc = jax.jit(
                lambda *arrs: tuple(
                    nvadv_fn.encode(m, a) for m, a in zip(vnames, arrs)
                )
                + (
                    nvadv_fn.encode(
                        vadv_var.out_name,
                        jnp.zeros((ni - 1, nj, nk), jnp.float32),
                    ),
                )
            )

            def _nv_fresh():
                return tuple(
                    jax.device_put(x)
                    for x in _nv_enc(*(device_random(vshape2) for _ in range(5)))
                )

            def make_nvadv(n):
                if not _nvadv_jit:
                    @jax.jit
                    def f(n, p_uts, p_ust, p_wcon, p_upos, p_utens, p_out):
                        state = dict(
                            zip(
                                vnames + (vadv_var.out_name,),
                                (p_uts, p_ust, p_wcon, p_upos, p_utens, p_out),
                            )
                        )
                        # chain out -> utens_stage (shapes match: both
                        # padded to the same sublane multiple); chain-major
                        # J-split keeps per-part working sets VMEM-resident
                        return nvadv_fn.chain_padded(
                            state, vscalars, n,
                            carry_map={"utens_stage": vadv_var.out_name},
                        )[vadv_var.out_name]

                    _nvadv_jit.append(f)
                f = _nvadv_jit[0]
                return lambda *args: f(n, *args)

            t_nvadv = timer.measure(make_nvadv, _nv_fresh, label="nvadv")
            results["next_vadv_us_per_step"] = round(t_nvadv * 1e6, 1)
            if "vadv_us_per_step" in results:
                results["next_vadv_vs_cartesian"] = round(
                    t_nvadv * 1e6 / results["vadv_us_per_step"], 2
                )
        results["next_vadv_bridged"] = bool(
            nvadv_fn is not None
            and getattr(vadv_var.backend, "last_strategy", None) == "staged"
        ) if on_tpu else True
    except Exception as e:
        results["next_vadv_error"] = f"{type(e).__name__}: {e}"[:200]

    # --- practical-bandwidth calibration: a pure XLA streaming triad with
    # hdiff's stream count (2 reads + 1 write). Nominal HBM bandwidth is
    # not achievable by ANY kernel; this measures the chip's practical
    # streaming ceiling so the roofline fractions above have context
    # (measured 0.78 of nominal on v5e — hdiff at 0.80+ is past the
    # generic-XLA ceiling). -------------------------------------------------
    try:
        _triad_jit: list = []

        def make_triad(n):
            if not _triad_jit:
                @jax.jit
                def f(n, a, b):
                    def body(i, carry):
                        x, y = carry
                        return (y * 1.0001 + b, x)
                    x, _ = lax.fori_loop(0, n, body, (a, jnp.zeros_like(a)))
                    return x
                _triad_jit.append(f)
            f = _triad_jit[0]
            return lambda *args: f(n, *args)

        t_triad = timer.measure(
            make_triad,
            lambda: (device_random(shape), device_random(shape)),
        )
        triad_bytes = 3 * shape[0] * shape[1] * shape[2] * 4
        triad_frac = (triad_bytes / t_triad) / peak_bw if peak_bw == peak_bw else float("nan")
        results["stream_triad_us"] = round(t_triad * 1e6, 1)
        results["practical_bw_frac"] = (
            round(triad_frac, 3) if triad_frac == triad_frac else None
        )
        if hdiff_frac == hdiff_frac and triad_frac == triad_frac and triad_frac > 0:
            results["hdiff_vs_practical_ceiling"] = round(hdiff_frac / triad_frac, 3)
    except Exception as e:
        results["triad_error"] = f"{type(e).__name__}: {e}"[:200]

    # --- bf16 streaming floor: the same triad at bfloat16. bf16 hdiff is
    # COMPUTE-bound on v5e (the VPU runs bf16 at the f32 rate, so halving
    # the bytes moves the memory time to ~half the f32 kernel's while the
    # compute time stays put — see docs/performance.md). Its honest
    # ceiling is therefore the f32 kernel's compute time, not the
    # halved-byte roofline; this row measures the bf16 stream floor so
    # both bounds of the max(mem, compute) model are on record. ----------
    try:
        _triad16_jit: list = []

        def make_triad16(n):
            if not _triad16_jit:
                @jax.jit
                def f(n, a, b):
                    def body(i, carry):
                        x, y = carry
                        return (y * jnp.bfloat16(1.0009) + b, x)
                    x, _ = lax.fori_loop(0, n, body, (a, jnp.zeros_like(a)))
                    return x
                _triad16_jit.append(f)
            f = _triad16_jit[0]
            return lambda *args: f(n, *args)

        t_triad16 = timer.measure(
            make_triad16,
            lambda: (
                device_random(shape, dtype=jnp.bfloat16),
                device_random(shape, dtype=jnp.bfloat16),
            ),
        )
        results["stream_triad_bf16_us"] = round(t_triad16 * 1e6, 1)
        tb_us = results.get("hdiff_bf16_us_per_step")
        tf_us = results.get("hdiff_us_per_step")
        if tb_us and t_triad16 > 0:
            # distance from the measured bf16 memory floor (same stream
            # count); >1.3 means the kernel left the bandwidth regime
            results["hdiff_bf16_vs_stream_floor"] = round(
                tb_us / (t_triad16 * 1e6), 2
            )
        if tb_us and tf_us:
            # f32 hdiff is bandwidth-bound, so its wall time upper-bounds
            # its compute time: bf16 time at/below it but above the bf16
            # stream floor pins the kernel to the compute bound
            results["hdiff_bf16_compute_bound"] = bool(
                t_triad16 * 1e6 * 1.3 < tb_us <= tf_us * 1.05
            )
    except Exception as e:
        results["triad_bf16_error"] = f"{type(e).__name__}: {e}"[:200]

    # --- bf16 VPU breakdown (round-5 verdict item 8b): demonstrate the
    # compute bound mechanically. Each shifted window hdiff forms is a
    # full VMEM round trip; measure a bf16 streaming copy vs the same
    # copy + ONE lane-shifted window at the split-kernel block shape.
    # hdiff forms ~8 distinct windows + 4 f32 selects, so
    #   vpu_model = copy + 8 * window_cost
    # matching the measured bf16 step pins it to the VPU, not HBM. ------
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        bshape = (nk, ni + 2 * halo, nj + 2 * halo)

        def _mk_bf16_probe(n_windows: int):
            def kern(a, o):
                x = a[...]
                for w in range(n_windows):
                    x = x + jnp.concatenate(
                        [a[:, :, w + 1 :], a[:, :, : w + 1]], axis=2
                    )
                o[...] = x

            spec = pl.BlockSpec(
                (1, bshape[1], bshape[2]), lambda s: (s, 0, 0)
            )
            call = pl.pallas_call(
                kern,
                grid=(nk,),
                in_specs=[spec],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct(bshape, jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)
                ),
            )
            jitted: list = []

            def make(n):
                if not jitted:
                    @jax.jit
                    def f(n, a):
                        def body(i, x):
                            with jax.enable_x64(False):
                                return call(x)
                        return lax.fori_loop(0, n, body, a)
                    jitted.append(f)
                f = jitted[0]
                return lambda *args: f(n, *args)

            return make

        t_cp = timer.measure(
            _mk_bf16_probe(0),
            lambda: (device_random(bshape, dtype=jnp.bfloat16),),
            label="bf16copy",
        )
        t_w1 = timer.measure(
            _mk_bf16_probe(1),
            lambda: (device_random(bshape, dtype=jnp.bfloat16),),
            label="bf16win",
        )
        win = max(t_w1 - t_cp, 0.0)
        results["bf16_window_cost_us"] = round(win * 1e6, 2)
        vpu_model = t_cp + 8 * win
        results["hdiff_bf16_vpu_model_us"] = round(vpu_model * 1e6, 1)
        tb_us = results.get("hdiff_bf16_us_per_step")
        if tb_us and vpu_model > 0:
            results["hdiff_bf16_vs_vpu_model"] = round(
                tb_us / (vpu_model * 1e6), 2
            )
    except Exception as e:
        results["bf16_window_error"] = f"{type(e).__name__}: {e}"[:200]


    # --- pallas plane-walk calibration: a bare 5-stream pallas kernel
    # walking K planes (the staged/sequential kernels' execution shape).
    # Measured MUCH faster than nominal HBM on the live device (1.6+ TB/s
    # — plane blocks pipeline through VMEM), which is why sequential
    # workloads can post roofline fractions ABOVE 1.0 against nominal:
    # the honest ceiling for that kernel class is THIS number. ------------
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def _pw_kernel(a, b, c, d, o):
            o[...] = a[...] + b[...] * c[...] - d[...]

        _pw_spec = pl.BlockSpec((1, ni, nj), lambda s: (s, 0, 0))
        _pw_call = pl.pallas_call(
            _pw_kernel,
            grid=(nk,),
            in_specs=[_pw_spec] * 4,
            out_specs=_pw_spec,
            out_shape=jax.ShapeDtypeStruct((nk, ni, nj), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)
            ),
        )
        _pw_jit: list = []

        def make_pw(n):
            if not _pw_jit:
                @jax.jit
                def f(n, a, b, c, d):
                    def body(i, dd):
                        # The remote Mosaic compiler crashes when traced
                        # under an x64-enabled context (known failure
                        # family) — pin it off like pallas_seq does.
                        with jax.enable_x64(False):
                            return _pw_call(a, b, c, dd)
                    return lax.fori_loop(0, n, body, d)
                _pw_jit.append(f)
            f = _pw_jit[0]
            return lambda *args: f(n, *args)

        t_pw = timer.measure(
            make_pw,
            lambda: tuple(device_random((nk, ni, nj)) for _ in range(4)),
            label="planewalk",
        )
        pw_bytes = 5 * nk * ni * nj * 4
        pw_bw = pw_bytes / t_pw
        results["planewalk5_us_per_step"] = round(t_pw * 1e6, 1)
        results["planewalk5_GBps"] = round(pw_bw / 1e9)
        # Sequential workloads against the plane-walk ceiling (their
        # kernel class): timings below this bound would be unphysical.
        for wname, streams in (("tridiag", 5), ("vadv", 6)):
            t_w = results.get(f"{wname}_us_per_step")
            if t_w:
                floor_us = (streams * ni * nj * nk * 4 / pw_bw) * 1e6
                results[f"{wname}_vs_planewalk_ceiling"] = round(
                    floor_us / t_w, 3
                )
    except Exception as e:
        results["planewalk_error"] = f"{type(e).__name__}: {e}"[:200]

    # --- chain-major ceiling (round-5 verdict item 4) ---------------------
    # Chain-major stepping amortizes HBM over the whole chain (one load +
    # one store per field per CHAIN), so the plane-walk HBM model no
    # longer bounds tridiag/vadv (tridiag beat it 1.45x in r04). What
    # remains per step is VPU work: the pipeline's per-plane BLOCK COPIES
    # between the VMEM-resident buffers and the kernel blocks (measured
    # bandwidth-bound: K-blocking the grid does not help), plus the
    # stencil arithmetic. Calibrate both with VMEM-resident probes fitted
    # exactly like the workloads (two-point chain fit, so the one-time
    # HBM in/out cancels):
    #   copy rate : carry-all probe, 4 in + 1 out blocked streams
    #   t_fma     : extra fused multiply-adds (4 independent chains)
    #   t_div     : extra divides
    # Ceiling(workload) = max(copies_bytes/rate, compute) — a perfect-
    # overlap lower bound. Stream counts come from the live kernels
    # (fn.stage_streams); parts from the chain's recorded j_split.
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        njp = nj // 2

        def _mk_probe(m_fma: int, n_div: int):
            def kern(a, b, c, d, o):
                accs = [a[...], b[...], c[...], d[...]]
                for i in range(m_fma):
                    accs[i % 4] = accs[i % 4] * np.float32(1.0000001) + accs[(i + 1) % 4]
                for i in range(n_div):
                    accs[i % 4] = accs[i % 4] / (accs[(i + 1) % 4] + np.float32(2.0))
                o[...] = accs[0] + accs[1] * accs[2] - accs[3]

            spec = pl.BlockSpec((1, ni, njp), lambda s: (s, 0, 0))
            call = pl.pallas_call(
                kern,
                grid=(nk,),
                in_specs=[spec] * 4,
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((nk, ni, njp), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)
                ),
            )
            jitted: list = []

            def make(n):
                if not jitted:
                    @jax.jit
                    def f(n, a, b, c, d):
                        def body(i, st):
                            a_, b_, c_, d_ = st
                            with jax.enable_x64(False):
                                o = call(a_, b_, c_, d_)
                            return (o, a_, b_, c_)
                        return lax.fori_loop(0, n, body, (a, b, c, d))[0]
                    jitted.append(f)
                f = jitted[0]
                return lambda *args: f(n, *args)

            return make

        def _probe_inputs():
            return tuple(device_random((nk, ni, njp)) for _ in range(4))

        t_copy = timer.measure(_mk_probe(0, 0), _probe_inputs, label="chaincopy")
        t_fma16 = timer.measure(_mk_probe(16, 0), _probe_inputs, label="chainfma")
        t_div4 = timer.measure(_mk_probe(0, 4), _probe_inputs, label="chaindiv")
        plane_b = ni * njp * 4
        copy_rate = 5 * nk * plane_b / t_copy  # bytes/s through block copies
        pts_part = ni * njp * nk
        t_fma = max((t_fma16 - t_copy) / 16 / pts_part, 0.0)
        t_div = max((t_div4 - t_copy) / 4 / pts_part, 0.0)
        results["chain_copy_rate_TBps"] = round(copy_rate / 1e12, 2)
        results["chain_fma_ps_per_point"] = round(t_fma * 1e12, 2)
        results["chain_div_ps_per_point"] = round(t_div * 1e12, 2)

        # Minimal (CSE'd) per-point op counts from the stencil bodies:
        # tridiag: fwd denom 2, recip-div 1, cp 1, dp 3; bwd 2 -> 8 fma+1 div
        # vadv: fwd gav/gcv 4, as_/cs/acol/ccol 4, bcol 2, correction 5,
        #       dcol 4, denom 2 + div 1, c/d update 4 -> 25; bwd 4 -> 29+1
        points_full = ni * nj * nk
        for wname, fn_obj, fmas, divs in (
            ("tridiag", locals().get("tri_pallas"), 8, 1),
            ("vadv", locals().get("vadv_pallas"), 29, 1),
        ):
            t_w = results.get(f"{wname}_us_per_step")
            if fn_obj is None or t_w is None:
                continue
            streams = getattr(fn_obj, "stage_streams", None)
            parts = getattr(
                getattr(fn_obj, "chain_padded", None), "last_j_split", None
            )
            if not streams or not parts:
                continue
            copies_bytes = sum(
                (n_in + n_out) * steps * ni * (nj // parts) * 4
                for n_in, n_out, steps in streams
            ) * parts
            copy_floor = copies_bytes / copy_rate
            compute = (fmas * t_fma + divs * t_div) * points_full
            ceiling_s = max(copy_floor, compute)
            results[f"{wname}_copy_floor_us"] = round(copy_floor * 1e6, 1)
            results[f"{wname}_compute_model_us"] = round(compute * 1e6, 1)
            results[f"{wname}_chain_ceiling_us"] = round(ceiling_s * 1e6, 1)
            results[f"{wname}_vs_chain_ceiling"] = round(
                ceiling_s * 1e6 / t_w, 3
            )
    except Exception as e:
        results["chain_ceiling_error"] = f"{type(e).__name__}: {e}"[:200]

    # --- copy + Laplacian at 48^3 (reference lap_cartesian_vs_next example
    # config, BASELINE.md configs row). Tiny workload: tracks dispatch +
    # small-domain kernel efficiency rather than HBM bandwidth. -----------
    try:
        # The bf16 hdiff section rebinds the module-global Field3F to the
        # bfloat16 descriptor; these stencils take f32 arrays — re-pin it.
        global Field3F
        Field3F = gtscript.Field[np.float32]

        def copy48(src: "Field3F", dst: "Field3F"):
            with gtscript.computation("PARALLEL"), gtscript.interval(...):
                dst = src[0, 0, 0]

        def lap48(src: "Field3F", dst: "Field3F"):
            with gtscript.computation("PARALLEL"), gtscript.interval(...):
                dst = -4.0 * src[0, 0, 0] + (
                    src[1, 0, 0] + src[-1, 0, 0] + src[0, 1, 0] + src[0, -1, 0]
                )

        n48 = 48
        lhalo = 1
        lshape = (n48 + 2 * lhalo, n48 + 2 * lhalo, n48)
        ldomain = (n48, n48, n48)
        for label, defn in (("copy48", copy48), ("lap48", lap48)):
            stl = gtscript.stencil(backend="jax", definition=defn, **s32)
            lorigins = {"src": (lhalo, lhalo, 0), "dst": (lhalo, lhalo, 0)}
            lfn = None
            if on_tpu:
                try:
                    lfn = build_pallas_fn(stl._analyzed, ldomain, lorigins)
                    if not hasattr(lfn, "call_padded"):
                        lfn = None
                except Exception:
                    lfn = None

            _l_jit: list = []

            def make_l(n, _lfn=lfn, _st=stl, _origins=lorigins, _jit=_l_jit, label=label):
                if not _jit:
                    if _lfn is not None and label == "lap48":
                        # unrolled x2: slot-stable ping-pong (see make_hdiff;
                        # 4.15 -> 2.02 us/step; the pure copy48 kernel
                        # measured SLOWER unrolled, keep it 1-step)
                        @jax.jit
                        def f(n, src):
                            p = _lfn.encode("src", src)
                            zero = jax.tree_util.tree_map(jnp.zeros_like, p)

                            def body2(i, carry):
                                a, b = carry
                                r1 = _lfn.call_padded({"src": a, "dst": b}, {})["dst"]
                                r2 = _lfn.call_padded({"src": r1, "dst": a}, {})["dst"]
                                return (r2, r1)

                            a, _ = lax.fori_loop(0, n // 2, body2, (p, zero))
                            return a
                    elif _lfn is not None:
                        @jax.jit
                        def f(n, src):
                            p = _lfn.encode("src", src)
                            zero = jax.tree_util.tree_map(jnp.zeros_like, p)

                            def body(i, carry):
                                a, b = carry
                                r = _lfn.call_padded({"src": a, "dst": b}, {})
                                return (r["dst"], a)

                            a, _ = lax.fori_loop(0, n, body, (p, zero))
                            return a
                    else:
                        @jax.jit
                        def f(n, src):
                            def body(i, carry):
                                a, b = carry
                                ev = Evaluator(
                                    _st._analyzed, ldomain, _origins,
                                    {"src": a, "dst": b}, {}, ns="jax",
                                )
                                return (ev.run()["dst"], a)
                            a, _ = lax.fori_loop(0, n, body, (src, jnp.zeros_like(src)))
                            return a
                    _jit.append(f)
                f = _jit[0]
                return lambda *args: f(n, *args)

            t_l = timer.measure(
                make_l,
                lambda: (device_random(lshape),),
            )
            results[f"{label}_us_per_step"] = round(t_l * 1e6, 2)
            results[f"{label}_Ggps"] = round(n48 ** 3 / t_l / 1e9, 3)
    except Exception as e:
        results["lap48_error"] = f"{type(e).__name__}: {e}"[:200]

    # Re-measure the primary workload at the end of the run and keep the
    # better estimate: executables are cached (zero extra compiles) and the
    # remote tunnel's state drifts over a long bench, so min-of-two
    # windows removes that drift from the scored number.
    try:
        t_hdiff2 = timer.measure(
            make_hdiff,
            lambda: (device_random(shape), device_random(shape)),
        )
        if t_hdiff2 < t_hdiff:
            t_hdiff = t_hdiff2
            hdiff_gps = points / t_hdiff
            hdiff_frac = (hdiff_bytes / t_hdiff) / peak_bw if peak_bw == peak_bw else float("nan")
            results["hdiff_Ggps"] = round(hdiff_gps / 1e9, 3)
            results["hdiff_us_per_step"] = round(t_hdiff * 1e6, 1)
            results["hdiff_roofline_frac"] = (
                round(hdiff_frac, 3) if hdiff_frac == hdiff_frac else None
            )
            if results.get("practical_bw_frac"):
                results["hdiff_vs_practical_ceiling"] = round(
                    hdiff_frac / results["practical_bw_frac"], 3
                )
    except Exception:
        pass

    # --- bf16 capacity win (round-5 verdict item 8a): a computation
    # whose f32 working set exceeds v5e HBM (15.75 GB usable) while the
    # bf16 one fits. A 3-buffer streaming update at 5120x4096x80 needs
    # 3 x 6.7 GB = 20.1 GB in f32 — the XLA compile REJECTS it with a
    # real hbm-capacity error — vs 10.1 GB in bf16, which compiles and
    # runs chained steps at the bf16 streaming rate. (Allocation itself
    # is virtualized by the remote runtime, so the honest capacity check
    # is compile + execute, with a VALUE read to force completion —
    # block_until_ready alone does not block through the tunnel.)
    # Runs LAST: the failed compile can leave allocator debris. ----------
    try:
        import time as _time

        cap_dom = (5120, 4096, 80)
        cap_pts = cap_dom[0] * cap_dom[1] * cap_dom[2]
        results["bf16_capacity_domain"] = "x".join(map(str, cap_dom))

        def _cap_step(dtype):
            @jax.jit
            def f(n, x, c):
                def body(i, cur):
                    return (
                        cur * np.float32(0.999) + c * np.float32(0.001)
                    ).astype(dtype)
                return lax.fori_loop(0, n, body, x)
            return f

        xb = jax.random.uniform(
            jax.random.PRNGKey(90), cap_dom, dtype=jnp.bfloat16
        )
        cb = jax.random.uniform(
            jax.random.PRNGKey(91), cap_dom, dtype=jnp.bfloat16
        )
        fb = _cap_step(jnp.bfloat16)
        np.asarray(fb(2, xb, cb)[0, 0, 0])  # warm + force
        t0 = _time.perf_counter()
        r = fb(10, xb, cb)
        np.asarray(r[0, 0, 0])  # force completion through the tunnel
        t1 = _time.perf_counter()
        t_cap = (t1 - t0) / 10
        results["bf16_capacity_us_per_step"] = round(t_cap * 1e6, 1)
        results["bf16_capacity_Ggps"] = round(cap_pts / t_cap / 1e9, 2)
        del xb, cb, r

        f32_compiles = True
        try:
            xf = jax.random.uniform(
                jax.random.PRNGKey(92), cap_dom, dtype=jnp.float32
            )
            cf = jax.random.uniform(
                jax.random.PRNGKey(93), cap_dom, dtype=jnp.float32
            )
            np.asarray(_cap_step(jnp.float32)(2, xf, cf)[0, 0, 0])
            del xf, cf
        except Exception:
            f32_compiles = False
        results["bf16_capacity_f32_compiles"] = f32_compiles
    except Exception as e:
        results["bf16_capacity_error"] = f"{type(e).__name__}: {e}"[:200]

    # Per-workload compile+warm seconds (persistent tk-probe + XLA caches
    # make repeat runs warm; cold numbers reflect the remote Mosaic probes)
    results["compile_warm_s"] = dict(timer.compile_times)
    # Run-to-run noise bars: (median-fit - min-fit)/min-fit per workload,
    # in percent — a metric wobble within its spread is noise, not a
    # regression.
    results["measurement_spread_pct"] = dict(timer.spread_pct)

    target = 0.80
    vs_baseline = round(hdiff_frac / target, 3) if hdiff_frac == hdiff_frac else None
    out = {
        "metric": "hdiff_256x256x80_f32_throughput",
        "value": round(hdiff_gps / 1e9, 3),
        "unit": "Ggridpoints/s",
        "vs_baseline": vs_baseline,
        "device": getattr(dev, "device_kind", str(dev)),
        "peak_hbm_GBps": None if peak_bw != peak_bw else round(peak_bw / 1e9),
        "details": results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
