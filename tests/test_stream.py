"""Device alert-stream preprocessing == host preprocessing (numeric parity)."""

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from applecider_tpu.infer.stream import (
    AlertStreamPipeline,
    featurize_events,
    merge_light_curve,
    pack_alert_batch,
    resample_spectrum,
)
from applecider_tpu.preprocessing.events import build_event_features, context_features
from applecider_tpu.preprocessing.photometry import merge_weighted
from applecider_tpu.preprocessing.spectra import interp_with_extrapolation, mad


def _ragged_lc(rng, n=40):
    t = np.sort(rng.uniform(0, 30, size=n)).astype(np.float32)
    flux = rng.uniform(1, 100, size=n).astype(np.float32)
    err = rng.uniform(0.1, 2, size=n).astype(np.float32)
    band = rng.integers(0, 3, size=n).astype(np.int32)
    return t, flux, err, band


def test_device_merge_matches_host(rng):
    P = 64
    t, flux, err, band = _ragged_lc(rng, 40)
    tp = np.zeros(P, np.float32); tp[:40] = t
    fp = np.zeros(P, np.float32); fp[:40] = flux
    ep = np.ones(P, np.float32); ep[:40] = err
    bp = np.zeros(P, np.int32); bp[:40] = band
    vp = np.zeros(P, bool); vp[:40] = True

    t_m, f_m, e_m, b_m, v_m = jax.jit(merge_light_curve)(
        jnp.asarray(tp), jnp.asarray(fp), jnp.asarray(ep), jnp.asarray(bp), jnp.asarray(vp)
    )
    t_m, f_m, e_m, b_m, v_m = map(np.asarray, (t_m, f_m, e_m, b_m, v_m))

    # host oracle: per-band merge, then merge all sorted by time
    host_rows = []
    for b in range(3):
        sel = band == b
        if sel.any():
            tm, fm, em = merge_weighted(t[sel].astype(np.float64), flux[sel], err[sel], 0.5)
            host_rows += [(tt, ff, ee, b) for tt, ff, ee in zip(tm, fm, em)]
    host_rows.sort()
    got = [(t_m[i], f_m[i], e_m[i], b_m[i]) for i in range(int(v_m.sum()))]
    assert len(got) == len(host_rows)
    for (tg, fg, eg, bg), (th, fh, eh, bh) in zip(got, host_rows):
        np.testing.assert_allclose([tg, fg, eg], [th, fh, eh], rtol=2e-5)
        assert bg == bh


def test_device_featurize_matches_host(rng):
    P = 64
    t, flux, err, band = _ragged_lc(rng, 30)
    # merged input (host) -> both featurizers
    merged = {
        "mjd": t.astype(np.float64),
        "flux": flux.astype(np.float64),
        "flux_error": err.astype(np.float64),
        "jd": t.astype(np.float64),
        "fid": (band + 1).astype(np.int16),
    }
    host = build_event_features(merged)
    host_feats = np.stack(
        [np.log1p(host["dt"]), np.log1p(host["dt_prev"]), host["logflux"], host["logflux_err"]], 1
    )
    ctx_host = context_features(merged, np.asarray([t.max()], np.float64))[0]

    tp = np.zeros(P, np.float32); tp[:30] = t
    fp = np.zeros(P, np.float32); fp[:30] = flux
    ep = np.ones(P, np.float32); ep[:30] = err
    bp = np.zeros(P, np.int32); bp[:30] = band
    vp = np.zeros(P, bool); vp[:30] = True
    feats, pad, ctx = jax.jit(featurize_events)(
        jnp.asarray(tp), jnp.asarray(fp), jnp.asarray(ep), jnp.asarray(bp), jnp.asarray(vp)
    )
    feats, ctx = np.asarray(feats), np.asarray(ctx)
    np.testing.assert_allclose(feats[:30, :4], host_feats, rtol=1e-4, atol=1e-5)
    one_hot = np.eye(3, dtype=np.float32)[band]
    np.testing.assert_allclose(feats[:30, 4:], one_hot)
    # context block (same column order, NaN -> -999 handled in both)
    expect = np.where(np.isfinite(ctx_host), ctx_host, -999.0)
    np.testing.assert_allclose(ctx, expect.astype(np.float32), rtol=1e-4, atol=1e-3)


def test_device_spectrum_matches_host(rng):
    S = 256
    wl = np.sort(rng.uniform(4000, 8500, size=200)).astype(np.float32)
    fx = rng.normal(size=200).astype(np.float32)
    grid = np.linspace(4500, 7980, 3481).astype(np.float32)

    host = interp_with_extrapolation(wl.astype(np.float64), fx.astype(np.float64), grid)
    mean = np.nanmean(host)
    scale = mad(host)
    host_norm = (host - mean) / scale

    wlp = np.zeros(S, np.float32); wlp[:200] = wl
    fxp = np.zeros(S, np.float32); fxp[:200] = fx
    vp = np.zeros(S, bool); vp[:200] = True
    dev = np.asarray(
        jax.jit(lambda w, f, v: resample_spectrum(w, f, v, jnp.asarray(grid)))(
            jnp.asarray(wlp), jnp.asarray(fxp), jnp.asarray(vp)
        )
    )
    np.testing.assert_allclose(dev, host_norm, rtol=2e-3, atol=2e-3)


def test_pipeline_end_to_end(rng):
    from __graft_entry__ import _fusion_task

    task = _fusion_task(tiny=True, compute_dtype="float32")
    samples = []
    for _ in range(4):
        t, flux, err, band = _ragged_lc(rng, 25)
        samples.append({
            "photo_t": t, "photo_flux": flux, "photo_err": err, "photo_band": band,
            "image": rng.normal(size=(63, 63, 3)).astype(np.float32),
            "meta19": rng.normal(size=19).astype(np.float32),
            "spec_wl": np.sort(rng.uniform(4000, 8500, 100)).astype(np.float32),
            "spec_flux": rng.normal(size=100).astype(np.float32),
        })
    raw = pack_alert_batch(samples, max_photo=32, max_spec=128)
    # tiny spectra model expects 128-bin input
    pipeline = AlertStreamPipeline(task, wave_grid=np.linspace(4500, 7980, 128, dtype=np.float32))
    batch = (raw["photo_t"][..., None].repeat(7, -1)[:, :32],)  # shapes only via init below
    variables = task.init(
        jax.random.PRNGKey(0),
        (np.zeros((4, 32, 7), np.float32), np.zeros((4, 32), bool),
         np.zeros((4, 24), np.float32), raw["image"], np.zeros((4, 128), np.float32),
         np.zeros(4, np.int64)),
    )
    probs = np.asarray(pipeline(variables["params"], raw))
    assert probs.shape == (4, 5)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)


def test_bucketed_packing_matches_full_length():
    """length_buckets packing yields the same probabilities as max_photo
    packing — padding is fully masked through merge/featurize/attention."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from __graft_entry__ import _fusion_batch, _fusion_task
    from bench import make_stream_samples

    from applecider_tpu.infer.stream import AlertStreamPipeline, pack_alert_batch

    task = _fusion_task(tiny=True, compute_dtype="float32")
    params = task.init(jax.random.PRNGKey(0), _fusion_batch(4, tiny=True))["params"]
    grid = np.linspace(4500.0, 7980.0, 128).astype(np.float32)
    pipe = AlertStreamPipeline(task, wave_grid=grid)

    samples = make_stream_samples(4, seed=9)  # lengths 20..180
    full = pack_alert_batch(samples, max_photo=257)
    bucketed = pack_alert_batch(samples, max_photo=257, length_buckets=(64, 192, 257))
    assert bucketed["photo_t"].shape[1] == 192  # longest curve <= 180
    p_full = np.asarray(pipe(params, full))
    p_bucket = np.asarray(pipe(params, bucketed))
    np.testing.assert_allclose(p_bucket, p_full, rtol=2e-5, atol=2e-6)


def test_pack_presorted_fast_path_matches_lexsort(rng):
    """pack_alert_batch skips the lexsort when every sample's times already
    ascend; the fast path must produce byte-identical batches to the sort
    path on the same logical data, including truncation and the cross-sample
    boundary exemption (sample i may end LATER than sample i+1 starts)."""
    from applecider_tpu.infer.stream import pack_alert_batch

    def mk(times):
        t = np.asarray(times, np.float32)
        n = t.shape[0]
        return {
            "photo_t": t,
            "photo_flux": rng.normal(size=n).astype(np.float32),
            "photo_err": rng.uniform(0.1, 1.0, size=n).astype(np.float32),
            "photo_band": rng.integers(0, 3, size=n).astype(np.int32),
            "image": rng.normal(size=(63, 63, 3)).astype(np.float32),
            "meta19": rng.normal(size=19).astype(np.float32),
            "spec_wl": None,
            "spec_flux": None,
        }

    # ascending per sample, boundary decreasing between samples -> fast path
    sorted_samples = [mk([1.0, 2.0, 5.0, 9.0]), mk([0.5, 3.0]), mk(np.arange(12.0))]
    # same logical data, shuffled within each sample -> lexsort path
    shuffled = []
    for s in sorted_samples:
        perm = rng.permutation(len(s["photo_t"]))
        sh = dict(s)
        for k in ("photo_t", "photo_flux", "photo_err", "photo_band"):
            sh[k] = s[k][perm]
        shuffled.append(sh)
    for max_photo in (257, 8):  # 8 exercises truncation (keep earliest)
        a = pack_alert_batch(sorted_samples, max_photo=max_photo)
        b = pack_alert_batch(shuffled, max_photo=max_photo)
        for k in ("photo_t", "photo_flux", "photo_err", "photo_band", "photo_valid"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"{k} @ {max_photo}")

    # NaN time: the ascending probe is False -> must fall back to the sort
    # (not crash, not scramble the finite entries)
    nan_samples = [mk([1.0, np.nan, 2.0]), mk([0.0, 4.0])]
    out = pack_alert_batch(nan_samples, max_photo=257)
    np.testing.assert_array_equal(out["photo_t"][1, :2], [0.0, 4.0])
    assert out["photo_valid"][0].sum() == 3

    # zero-length sample between non-empty ones: boundary index bookkeeping
    empty_mid = [mk([1.0, 2.0]), mk([]), mk([0.0, 3.0])]
    out = pack_alert_batch(empty_mid, max_photo=257)
    np.testing.assert_array_equal(out["photo_t"][0, :2], [1.0, 2.0])
    assert not out["photo_valid"][1].any()
    np.testing.assert_array_equal(out["photo_t"][2, :2], [0.0, 3.0])


def test_pack_bf16_image_prealloc_matches_stack(rng):
    """the row-assign bf16 image path equals stack().astype(bf16) exactly
    (same C cast, no intermediate)."""
    import jax.numpy as jnp

    from applecider_tpu.infer.stream import pack_alert_batch
    from bench import make_stream_samples

    samples = make_stream_samples(6, seed=11)
    got = pack_alert_batch(samples, max_photo=64, image_dtype=jnp.bfloat16)["image"]
    want = np.stack([s["image"] for s in samples]).astype(jnp.bfloat16)
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(got.view(np.uint16), want.view(np.uint16))


def test_frozen_params_pipeline_matches_and_routes_fft():
    """freeze_params_with bakes weights into the executable: outputs match
    the arg-passing pipeline, and the conv router treats kernel FFTs as
    free (FFT viable at batch 1)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from __graft_entry__ import _fusion_batch, _fusion_task
    from bench import make_stream_samples

    from applecider_tpu.infer.stream import AlertStreamPipeline, pack_alert_batch
    from applecider_tpu.ops.conv1d import _fft_wins, frozen_kernel_hint

    # routing hint: at batch 1 the kernel-FFT cost normally kills FFT...
    assert not _fft_wins(3481, 1021, 1, 64, batch=1)
    with frozen_kernel_hint(True):  # ...but frozen kernels make it free
        assert _fft_wins(3481, 1021, 1, 64, batch=1)

    task = _fusion_task(tiny=True, compute_dtype="float32")
    params = task.init(jax.random.PRNGKey(0), _fusion_batch(2, tiny=True))["params"]
    grid = np.linspace(4500.0, 7980.0, 128).astype(np.float32)
    raw = pack_alert_batch(make_stream_samples(2, seed=4), max_photo=32, max_spec=64)

    plain = AlertStreamPipeline(task, wave_grid=grid)
    frozen = AlertStreamPipeline(task, wave_grid=grid, freeze_params_with=params)
    np.testing.assert_allclose(
        np.asarray(frozen(raw)), np.asarray(plain(params, raw)), rtol=2e-5, atol=2e-6
    )


def test_routed_stream_matches_monolithic(rng):
    """Spectrum-presence routing returns exactly the monolithic pipeline's
    probabilities, in input order, across mixed / all-spec / no-spec
    batches and sub-batch padding."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from __graft_entry__ import _fusion_batch, _fusion_task

    from applecider_tpu.infer.stream import (
        AlertStreamPipeline, RoutedAlertStream, pack_alert_batch,
    )

    task = _fusion_task(tiny=True, compute_dtype="float32")
    params = task.init(jax.random.PRNGKey(0), _fusion_batch(4, tiny=True))["params"]
    grid = np.linspace(4500.0, 7980.0, 128).astype(np.float32)
    mono = AlertStreamPipeline(task, wave_grid=grid)
    router = RoutedAlertStream(task, batch_buckets=(2, 4, 8), wave_grid=grid)

    def mk_samples(n, spec_flags):
        samples = []
        for i in range(n):
            t = np.sort(rng.uniform(0, 30, 20)).astype(np.float32)
            s = {
                "photo_t": t,
                "photo_flux": rng.uniform(1, 100, 20).astype(np.float32),
                "photo_err": rng.uniform(0.1, 2, 20).astype(np.float32),
                "photo_band": rng.integers(0, 3, 20).astype(np.int32),
                "image": rng.normal(size=(63, 63, 3)).astype(np.float32),
                "meta19": rng.normal(size=19).astype(np.float32),
            }
            if spec_flags[i]:
                s["spec_wl"] = np.sort(rng.uniform(4000, 8500, 80)).astype(np.float32)
                s["spec_flux"] = rng.normal(size=80).astype(np.float32)
            samples.append(s)
        return samples

    for flags in ([True, False, True, False, False], [True] * 3, [False] * 3):
        samples = mk_samples(len(flags), flags)
        want = np.asarray(mono(params, pack_alert_batch(samples, max_photo=32)))
        got = router(params, samples)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6,
                                   err_msg=f"flags={flags}")


def test_fused_spectra_stream_matches_monolithic(rng):
    """The single-program compact-spectra router (shared encoders at full
    batch, SpectraNet on the (S+1) block, gather back) returns the
    monolithic pipeline's probabilities across mixed / all-spec / no-spec /
    empty batches, including spectra-bucket padding rows."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from __graft_entry__ import _fusion_batch, _fusion_task

    from applecider_tpu.infer.stream import (
        AlertStreamPipeline, FusedSpectraStream, pack_alert_batch,
    )

    task = _fusion_task(tiny=True, compute_dtype="float32")
    params = task.init(jax.random.PRNGKey(0), _fusion_batch(4, tiny=True))["params"]
    grid = np.linspace(4500.0, 7980.0, 128).astype(np.float32)
    mono = AlertStreamPipeline(task, wave_grid=grid)
    fused = FusedSpectraStream(task, spec_buckets=(0, 2, 4, 8), wave_grid=grid)

    def mk_samples(n, spec_flags):
        samples = []
        for i in range(n):
            t = np.sort(rng.uniform(0, 30, 20)).astype(np.float32)
            s = {
                "photo_t": t,
                "photo_flux": rng.uniform(1, 100, 20).astype(np.float32),
                "photo_err": rng.uniform(0.1, 2, 20).astype(np.float32),
                "photo_band": rng.integers(0, 3, 20).astype(np.int32),
                "image": rng.normal(size=(63, 63, 3)).astype(np.float32),
                "meta19": rng.normal(size=19).astype(np.float32),
            }
            if spec_flags[i]:
                s["spec_wl"] = np.sort(rng.uniform(4000, 8500, 80)).astype(np.float32)
                s["spec_flux"] = rng.normal(size=80).astype(np.float32)
            samples.append(s)
        return samples

    for flags in ([True, False, True, False, False], [True] * 3, [False] * 3):
        samples = mk_samples(len(flags), flags)
        want = np.asarray(mono(params, pack_alert_batch(samples, max_photo=32)))
        got = fused(params, samples)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6,
                                   err_msg=f"flags={flags}")

    assert fused(params, []).shape[0] == 0


def test_length_binned_feeder_matches_monolithic(rng):
    """LengthBinnedFeeder only reorders which batch a sample rides in:
    reassembled outputs == the monolithic pipeline per sample, across
    full flushes, padded partial flushes, and mixed spectra presence."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from __graft_entry__ import _fusion_batch, _fusion_task

    from applecider_tpu.infer.stream import (
        AlertStreamPipeline, FusedSpectraStream, LengthBinnedFeeder,
        pack_alert_batch,
    )

    task = _fusion_task(tiny=True, compute_dtype="float32")
    params = task.init(jax.random.PRNGKey(0), _fusion_batch(4, tiny=True))["params"]
    grid = np.linspace(4500.0, 7980.0, 128).astype(np.float32)
    mono = AlertStreamPipeline(task, wave_grid=grid)
    fused = FusedSpectraStream(task, spec_buckets=(0, 2, 4, 8), wave_grid=grid)
    feeder = LengthBinnedFeeder(fused, params, flush_bs=3,
                                length_buckets=(8, 16, 32), max_photo=32)

    def mk_sample(P, with_spec):
        t = np.sort(rng.uniform(0, 30, P)).astype(np.float32)
        s = {
            "photo_t": t,
            "photo_flux": rng.uniform(1, 100, P).astype(np.float32),
            "photo_err": rng.uniform(0.1, 2, P).astype(np.float32),
            "photo_band": rng.integers(0, 3, P).astype(np.int32),
            "image": rng.normal(size=(63, 63, 3)).astype(np.float32),
            "meta19": rng.normal(size=19).astype(np.float32),
        }
        if with_spec:
            s["spec_wl"] = np.sort(rng.uniform(4000, 8500, 80)).astype(np.float32)
            s["spec_flux"] = rng.normal(size=80).astype(np.float32)
        return s

    n = 11
    lengths = [5, 20, 9, 30, 12, 7, 25, 16, 4, 28, 10]
    samples = [mk_sample(P, i % 3 == 0) for i, P in enumerate(lengths)]

    got = np.zeros((n, mono(
        params, pack_alert_batch(samples[:1], max_photo=32)).shape[1]))
    seen = np.zeros(n, bool)
    batches = feeder.submit(list(enumerate(samples))) + feeder.flush()
    assert feeder.flush() == []  # queues drained
    for indices, resolver in batches:
        probs = resolver()
        assert probs.shape[0] == len(indices)  # pad rows sliced off
        got[np.asarray(indices)] = probs
        seen[np.asarray(indices)] = True
    assert seen.all()

    # per-sample oracle: each sample through the monolithic pipeline alone
    for i, s in enumerate(samples):
        want = np.asarray(mono(params, pack_alert_batch([s], max_photo=32)))[0]
        np.testing.assert_allclose(got[i], want, rtol=2e-5, atol=2e-6,
                                   err_msg=f"sample {i} (P={lengths[i]})")


def test_merge_variants_exactly_equivalent(rng):
    """flags_impl x compact_impl variants of merge_light_curve return
    bit-identical outputs (the TPU auto default routes to scan+rank; CPU
    to doubling+argsort)."""
    from applecider_tpu.infer.stream import merge_light_curve

    for trial in range(8):
        P = int(rng.integers(3, 70))
        n_valid = int(rng.integers(0, P + 1))
        t = np.sort(rng.uniform(0, 30, P)).astype(np.float32)
        t[n_valid:] = np.inf
        args = (
            jnp.asarray(t),
            jnp.asarray(rng.uniform(1, 100, P).astype(np.float32)),
            jnp.asarray(rng.uniform(0.1, 2, P).astype(np.float32)),
            jnp.asarray(rng.integers(0, 3, P).astype(np.int32)),
            jnp.asarray(np.arange(P) < n_valid),
        )
        base = merge_light_curve(*args, assume_sorted=True,
                                 flags_impl="doubling", compact_impl="argsort")
        for fi in ("doubling", "scan"):
            for ci in ("argsort", "rank"):
                got = merge_light_curve(*args, assume_sorted=True,
                                        flags_impl=fi, compact_impl=ci)
                for a, b in zip(base, got):
                    np.testing.assert_array_equal(
                        np.asarray(a), np.asarray(b),
                        err_msg=f"trial={trial} {fi}/{ci}")


def test_pointer_doubling_merge_flags_match_scan(rng):
    """The O(log P) pointer-doubling group-start computation is exactly the
    greedy scan, across random band patterns, duplicates, and edge cases."""
    from applecider_tpu.infer.stream import _band_group_flags, _band_group_flags_scan

    for trial in range(30):
        P = int(rng.integers(1, 80))
        t = np.sort(rng.uniform(0, 30, P)).astype(np.float32)
        if trial % 3 == 0 and P > 4:  # inject duplicates and exact-dt gaps
            t[P // 2] = t[P // 2 - 1]
            t[-1] = t[-2] + 0.5
        # packing contract: valid entries form a time-sorted prefix
        n_valid = int(rng.integers(0, P + 1))
        valid = np.arange(P) < n_valid
        t_sorted = np.where(valid, t, np.inf).astype(np.float32)
        band = rng.integers(0, 3, P)
        is_band = valid & (band == 1)
        want = np.asarray(_band_group_flags_scan(
            jnp.asarray(t_sorted), jnp.asarray(is_band), 0.5))
        got = np.asarray(_band_group_flags(
            jnp.asarray(t_sorted), jnp.asarray(is_band), 0.5))
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial} P={P}")


def test_fill_resample_matches_reference(rng):
    """The scatter+associative-scan interp (uniform-grid fast path) selects
    exactly the reference's bracketing samples — including duplicates,
    empty tails, out-of-range grids, and exact grid-point hits."""
    from applecider_tpu.infer.stream import _resample_spectrum_reference, resample_spectrum

    grid = jnp.asarray(np.linspace(4500, 7980, 3481, dtype=np.float32))
    for trial in range(12):
        S = int(rng.integers(8, 512))
        n_valid = int(rng.integers(3, S + 1))
        wl = np.sort(rng.uniform(4000, 8500, size=n_valid)).astype(np.float32)
        if trial % 3 == 0 and n_valid > 6:  # duplicate wavelengths
            wl[n_valid // 2] = wl[n_valid // 2 - 1]
        if trial % 4 == 0:  # exact grid-point hits
            wl[: min(5, n_valid)] = np.asarray(grid)[[7, 99, 1000, 2480, 3480]][: min(5, n_valid)]
            wl = np.sort(wl)
        # flux as a deterministic function of wavelength: equal wavelengths
        # always carry equal flux, so the bracketing-sample choice among
        # duplicates (order-dependent in the unsorted path) can't matter
        fx = np.sin(wl * 0.013).astype(np.float32) + 0.1 * np.cos(wl).astype(np.float32)
        wlp = np.zeros(S, np.float32); wlp[:n_valid] = wl
        fxp = np.zeros(S, np.float32); fxp[:n_valid] = fx
        vp = np.zeros(S, bool); vp[:n_valid] = True

        ref = np.asarray(jax.jit(
            lambda w, f, v: _resample_spectrum_reference(w, f, v, grid)
        )(wlp, fxp, vp))
        got_sorted = np.asarray(jax.jit(
            lambda w, f, v: resample_spectrum(w, f, v, grid, assume_sorted=True)
        )(wlp, fxp, vp))
        np.testing.assert_allclose(got_sorted, ref, rtol=1e-5, atol=1e-6,
                                   err_msg=f"trial {trial} (sorted path)")

        # unsorted input through the default (argsort) path
        perm = rng.permutation(n_valid)
        wlu = wlp.copy(); wlu[:n_valid] = wl[perm]
        fxu = fxp.copy(); fxu[:n_valid] = fx[perm]
        got_unsorted = np.asarray(jax.jit(
            lambda w, f, v: resample_spectrum(w, f, v, grid)
        )(wlu, fxu, vp))
        np.testing.assert_allclose(got_unsorted, ref, rtol=1e-5, atol=1e-6,
                                   err_msg=f"trial {trial} (unsorted path)")


def test_resample_nonuniform_grid_falls_back(rng):
    """Non-uniform grids route to the reference path (same results by
    construction); the dispatch itself must not crash or mis-route."""
    from applecider_tpu.infer.stream import _resample_spectrum_reference, resample_spectrum

    grid = jnp.asarray(np.sort(rng.uniform(4500, 7980, 257)).astype(np.float32))
    wl = np.sort(rng.uniform(4000, 8500, 64)).astype(np.float32)
    fx = rng.normal(size=64).astype(np.float32)
    vp = np.ones(64, bool)
    ref = np.asarray(_resample_spectrum_reference(wl, fx, vp, grid))
    got = np.asarray(resample_spectrum(wl, fx, vp, grid))
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)


def test_median_no_sort_matches_jnp_median(rng):
    """Histogram median == jnp.median to f32 resolution, across sizes,
    duplicates, and scales."""
    from applecider_tpu.infer.stream import _median_no_sort

    for trial in range(20):
        n = int(rng.integers(2, 4000))
        scale = 10.0 ** rng.integers(-3, 4)
        x = (rng.normal(size=n) * scale).astype(np.float32)
        if trial % 4 == 0:
            x[: n // 2] = x[0]  # heavy duplicates
        got = float(_median_no_sort(jnp.asarray(x)))
        want = float(np.median(x))
        assert abs(got - want) <= 1e-5 * max(scale, 1.0), (trial, n, got, want)


def test_median_no_sort_outlier_immune():
    """Round-3 review regression: a single huge outlier blows the value
    range, and a raw bucket-width interval (range/bins^passes) leaves the
    median wrong by ~range/2^28. The in-bucket data clamp must keep the
    result exact regardless of outlier magnitude."""
    from applecider_tpu.infer.stream import _median_no_sort

    cases = [
        np.asarray([2.5] * 101 + [1e8], np.float32),
        np.asarray([0.0] * 100 + [1e30], np.float32),
        np.asarray([-1e30] + [7.0] * 33, np.float32),
        np.asarray([1e30, -1e30] + [3.25] * 11, np.float32),
    ]
    for x in cases:
        got = float(_median_no_sort(jnp.asarray(x)))
        want = float(np.median(x))
        assert abs(got - want) <= 1e-5 * max(abs(want), 1.0), (got, want)


def test_median_exact_matches_jnp_median(rng):
    """The hot-path median (lax.top_k selection) is bitwise-exact vs
    np.median across sizes, duplicates, scales, and the outlier shape the
    histogram variant measurably missed (0.029 at (3481,) + 1e30 on TPU —
    tpu_results/median_ab_r3.jsonl)."""
    from applecider_tpu.infer.stream import _median_exact

    for trial in range(20):
        n = int(rng.integers(2, 4000))
        scale = 10.0 ** rng.integers(-3, 4)
        x = (rng.normal(size=n) * scale).astype(np.float32)
        if trial % 4 == 0:
            x[: n // 2] = x[0]  # heavy duplicates
        got = float(_median_exact(jnp.asarray(x)))
        want = float(np.median(x))
        assert got == want, (trial, n, got, want)

    big = (rng.normal(size=3481) * 100).astype(np.float32)
    big[7] = 1e30  # the histogram-median regression shape
    assert float(_median_exact(jnp.asarray(big))) == float(np.median(big))
    # batched form (the compact-spectra block path)
    blk = (rng.normal(size=(5, 3481)) * 3).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(_median_exact(jnp.asarray(blk))), np.median(blk, axis=-1)
    )


def test_fft_conv_hard_gated_on_tpu(monkeypatch):
    """Round-3 correctness gate: the XLA TPU FFT conv path returns wrong
    results at batch >= ~64, so 'auto' must NEVER route FFT on TPU — even
    under the frozen-kernel hint that makes the FFT model-cost tiny."""
    import applecider_tpu.ops.conv1d as c

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    c._penalty_cache = None  # drop any cached CPU penalty
    try:
        assert not c._fft_wins(3481, 1021, 1, 64, batch=256)
        with c.frozen_kernel_hint(True):
            assert not c._fft_wins(3481, 1021, 1, 64, batch=1)
    finally:
        c._penalty_cache = None


def test_s2d_conv_matches_direct(rng):
    """conv1d_s2d (space-to-depth polyphase rewrite) == conv1d_direct —
    the equivalence the op's docstring promises, across kernel sizes,
    channel counts, block sizes, and the SpectraNet stage-0 shape."""
    from applecider_tpu.ops.conv1d import conv1d_direct, conv1d_s2d

    for L, K, cin, cout, R in [
        (40, 7, 1, 4, 8), (3481, 1021, 1, 8, 8), (3481, 61, 1, 8, 8),
        (870, 251, 16, 8, 8), (100, 3, 3, 5, 4), (13, 13, 8, 8, 8),
    ]:
        x = rng.normal(size=(2, L, cin)).astype(np.float32)
        w = rng.normal(size=(K, cin, cout)).astype(np.float32)
        b = rng.normal(size=(cout,)).astype(np.float32)
        y0 = np.asarray(conv1d_direct(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
        y1 = np.asarray(conv1d_s2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), block=R))
        denom = max(float(np.abs(y0).max()), 1e-9)
        np.testing.assert_allclose(y1 / denom, y0 / denom, rtol=0, atol=2e-6,
                                   err_msg=f"L={L} K={K} cin={cin} cout={cout} R={R}")


def test_s2d_auto_routing_gate(rng, monkeypatch):
    """The TPU auto-route to conv1d_s2d (_s2d_wins): shape gate correct,
    ACS2D override honored, and the routed path — including its VJP, which
    training traverses — matches conv1d_direct's."""
    from applecider_tpu.ops import conv1d as c

    # gate shape rule (platform forced on via ACS2D=1)
    monkeypatch.setenv("ACS2D", "1")
    assert c._s2d_wins(1021, 1) and c._s2d_wins(513, 2)
    assert not c._s2d_wins(61, 1)      # measured 0.83x — loses
    assert not c._s2d_wins(1021, 64)   # direct already MXU-saturated
    monkeypatch.setenv("ACS2D", "0")
    assert not c._s2d_wins(1021, 1)    # kill switch
    monkeypatch.delenv("ACS2D")
    # unset -> platform rule; this suite runs on CPU, so no reroute
    assert not c._s2d_wins(1021, 1)

    # value + grad equivalence through the public dispatcher at the
    # stage-0 shape (small cout keeps CPU time down)
    monkeypatch.setenv("ACS2D", "1")
    x = jnp.asarray(rng.normal(size=(3, 3481, 1)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(1021, 1, 4)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))

    def loss(mode):
        return lambda w, b: jnp.sum(jnp.square(c.conv1d(x, w, b, mode=mode)))

    (y1, g1) = jax.value_and_grad(loss("auto"), argnums=(0, 1))(w, b)
    monkeypatch.setenv("ACS2D", "0")
    (y0, g0) = jax.value_and_grad(loss("direct"), argnums=(0, 1))(w, b)
    np.testing.assert_allclose(float(y1), float(y0), rtol=1e-6)
    for a, d in zip(g1, g0):
        denom = max(float(jnp.abs(d).max()), 1e-9)
        np.testing.assert_allclose(np.asarray(a) / denom, np.asarray(d) / denom,
                                   rtol=0, atol=2e-6)


def test_fused_band_flags_match_per_band_scan(rng):
    """The single fused all-bands scan == N_BANDS independent scans."""
    from applecider_tpu.infer.stream import (
        _all_band_group_flags_scan, _band_group_flags_scan,
    )

    for trial in range(20):
        P = int(rng.integers(1, 90))
        t = np.sort(rng.uniform(0, 30, P)).astype(np.float32)
        if trial % 3 == 0 and P > 4:
            t[P // 2] = t[P // 2 - 1]  # duplicates
        n_valid = int(rng.integers(0, P + 1))
        valid = np.arange(P) < n_valid
        t_sorted = np.where(valid, t, np.inf).astype(np.float32)
        band = rng.integers(0, 3, P).astype(np.int32)
        got = np.asarray(_all_band_group_flags_scan(
            jnp.asarray(t_sorted), jnp.asarray(band), jnp.asarray(valid), 0.5))
        for b in range(3):
            want = np.asarray(_band_group_flags_scan(
                jnp.asarray(t_sorted),
                jnp.asarray(valid & (band == b)), 0.5))
            np.testing.assert_array_equal(got[:, b], want,
                                          err_msg=f"trial {trial} band {b}")


def test_pack_decimates_long_spectra_full_range():
    """Raw spectra longer than max_spec are bin-averaged over the full
    wavelength range (a [:max_spec] truncation would keep only the bluest
    stub); short spectra pass through exactly."""
    wl = np.linspace(3500, 9500, 2000).astype(np.float32)
    fx = np.sin(wl / 300.0).astype(np.float32)
    s = {
        "photo_t": np.array([0.0, 1.0], np.float32),
        "photo_flux": np.ones(2, np.float32),
        "photo_err": np.ones(2, np.float32),
        "photo_band": np.zeros(2, np.int32),
        "image": np.zeros((63, 63, 3), np.float32),
        "meta19": np.zeros(19, np.float32),
        "spec_wl": wl, "spec_flux": fx,
    }
    raw = pack_alert_batch([s], max_photo=4, max_spec=512)
    assert raw["spec_valid"][0].sum() == 512
    got_wl = raw["spec_wl"][0][raw["spec_valid"][0]]
    assert got_wl[0] < 3520 and got_wl[-1] > 9480
    got_fx = raw["spec_flux"][0][raw["spec_valid"][0]]
    np.testing.assert_allclose(got_fx, np.sin(got_wl / 300.0), atol=0.02)

    # FusedSpectraStream's compact block applies the same decimation
    from applecider_tpu.infer.stream import FusedSpectraStream

    class _T:  # placement only — no forward needed
        pass

    fused = FusedSpectraStream.__new__(FusedSpectraStream)
    fused.spec_buckets = (0, 2)
    fused.max_spec = 512

    class _Pipe:
        mesh = None
    fused.pipe = _Pipe()
    placed = FusedSpectraStream.place(fused, [s], length_buckets=(4,))
    swl = np.asarray(placed["spec_wl"])[1]
    svd = np.asarray(placed["spec_valid"])[1]
    assert svd.sum() == 512 and swl[svd][-1] > 9480


def test_merge_out_of_range_band_stays_unmerged():
    """A valid point whose band falls outside [0, 3) is excluded from every
    group in EVERY implementation (doubling/scan x argsort/rank agree)."""
    from applecider_tpu.infer.stream import merge_light_curve

    t = np.array([1.0, 2.0, 3.0, 4.0, np.inf], np.float32)
    flux = np.array([10, 20, 30, 40, 0], np.float32)
    err = np.ones(5, np.float32)
    band = np.array([0, 3, 0, 1, 0], np.int32)  # band 3 = out of range
    valid = np.array([True, True, True, True, False])
    outs = {}
    for fi in ("doubling", "scan"):
        for ci in ("argsort", "rank"):
            outs[(fi, ci)] = [np.asarray(a) for a in merge_light_curve(
                jnp.asarray(t), jnp.asarray(flux), jnp.asarray(err),
                jnp.asarray(band), jnp.asarray(valid),
                assume_sorted=True, flags_impl=fi, compact_impl=ci)]
    base = outs[("doubling", "argsort")]
    for k, got in outs.items():
        for a, b in zip(base, got):
            np.testing.assert_array_equal(a, b, err_msg=str(k))
    # the band-3 point contributed to no merged row: 20 never appears
    t_m, f_m, e_m, b_m, v_m = base
    assert not np.any(np.isclose(f_m[v_m], 20.0))
    assert v_m.sum() == 3  # three in-range groups survive


def test_featurize_horizon_cut_matches_row_drop(rng):
    """horizon masking == the training datasets' row drop (dt <= horizon,
    fusion_dataset.py / photo_dataset.build_photo_features): merged events
    are time-ascending so the cut is a suffix; masked rows must look
    exactly like padding, and the CONTEXT block must stay UNCUT (training
    context features are causal scans with no horizon)."""
    P, n = 64, 40
    t = np.sort(rng.uniform(0, 300, n)).astype(np.float32)  # spans > 100 d
    t[0] = 0.0
    flux = rng.uniform(1, 100, n).astype(np.float32)
    err = rng.uniform(0.1, 2, n).astype(np.float32)
    band = rng.integers(0, 3, n).astype(np.int32)
    horizon = 100.0
    n_keep = int((t - t[0] <= horizon).sum())
    assert 0 < n_keep < n  # the cut actually bites

    def pack(tt, ff, ee, bb, m):
        tp = np.zeros(P, np.float32); tp[:m] = tt[:m]
        fp = np.zeros(P, np.float32); fp[:m] = ff[:m]
        ep = np.ones(P, np.float32); ep[:m] = ee[:m]
        bp = np.zeros(P, np.int32); bp[:m] = bb[:m]
        vp = np.zeros(P, bool); vp[:m] = True
        return map(jnp.asarray, (tp, fp, ep, bp, vp))

    # device cut: full history + horizon mask
    feats, pad, ctx = jax.jit(partial(featurize_events, horizon=horizon))(
        *pack(t, flux, err, band, n))
    # oracle: training-style row drop BEFORE featurization, no horizon
    feats_o, pad_o, _ = jax.jit(featurize_events)(
        *pack(t, flux, err, band, n_keep))
    np.testing.assert_allclose(np.asarray(feats), np.asarray(feats_o),
                               rtol=1e-6, atol=0)
    np.testing.assert_array_equal(np.asarray(pad), np.asarray(pad_o))
    # context stays computed over the FULL causal history
    _, _, ctx_full = jax.jit(featurize_events)(*pack(t, flux, err, band, n))
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx_full),
                               rtol=1e-6, atol=0)


def test_pack_trailing_empty_sample(rng):
    """A sample with an EMPTY light curve in the LAST slot must pack (the
    presorted-detection boundary index ran past len(diff))."""
    from applecider_tpu.infer.stream import pack_alert_batch

    def mk(P):
        return {
            "photo_t": np.sort(rng.uniform(0, 30, P)).astype(np.float32),
            "photo_flux": rng.uniform(1, 100, P).astype(np.float32),
            "photo_err": rng.uniform(0.1, 2, P).astype(np.float32),
            "photo_band": rng.integers(0, 3, P).astype(np.int32),
            "image": np.zeros((63, 63, 3), np.float32),
            "meta19": np.zeros(19, np.float32),
        }

    for layout in ([5, 0], [0, 5], [5, 0, 0], [0]):
        samples = [mk(P) for P in layout]
        raw = pack_alert_batch(samples, max_photo=16)
        assert raw["photo_valid"].sum() == sum(layout)
        for i, P in enumerate(layout):
            assert raw["photo_valid"][i].sum() == P


def test_pack_empty_batch_with_buckets():
    """pack_alert_batch([], length_buckets=...) returns empty arrays
    instead of crashing in the bucket-size max()."""
    from applecider_tpu.infer.stream import pack_alert_batch

    raw = pack_alert_batch([], length_buckets=(8, 16))
    assert raw["photo_t"].shape[0] == 0
    assert raw["image"].shape[0] == 0
