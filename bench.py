"""Throughput benchmark: batched KPFusion RGB-D inference, frames/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N, ...}
Baseline north star: >= 3000 RGB-D frames/sec/chip at bs >= 64 on v5e
(BASELINE.md). Runs in bfloat16 inference mode on the default device.

Methodology — defensible against runtimes that overlap, elide, or MEMOIZE
dispatches (the 'axon' remote TPU platform returns cached results for a
repeated call with identical executable+inputs, which made round-1's
repeat-same-input loop report physically impossible numbers):
  * the primary number times ONE execution of a precompiled ``lax.scan``
    whose carry feeds a function of iteration k's OUTPUT into iteration
    k+1's INPUT — the 30 iterations are data-dependent inside a single
    dispatch, so they can neither overlap nor be served from cache;
  * timing waits on a HOST FETCH of the final joints (jax.device_get),
    not block_until_ready — on the axon tunnel block_until_ready returns
    on dispatch acknowledgment (~0.8 ms RTT regardless of batch size),
    which made round 1's numbers pure round-trip latency;
  * the cross-check loop fetches per call over DISTINCT pre-staged inputs
    (no two dispatches share an input buffer);
  * FLOPs come from XLA's ``compiled.cost_analysis()`` on the single-batch
    executable, and the implied MFU against the device's bf16 peak is in
    the JSON so an impossible number is self-evident in the artifact.
"""

import json
import os
import time

import numpy as np

BASELINE_FPS = 3000.0
# 120 chained iterations: the single host fetch that stops the clock costs
# a full ~25 ms tunnel round trip; at 30 iterations that RTT deflated the
# per-batch figure by ~1.2 ms/batch (measured: a trivial [256,21,3] mul
# "cost" 1.2 ms/step in a 20-step chain). 120 steps amortize it to ~0.2 ms
# — the chain is still data-dependent and fetch-waited, unchanged.
ITERS = 120

# bf16 dense peak FLOP/s by libtpu device_kind (public spec sheets).
PEAK_BF16_FLOPS = {
    'TPU v3': 123e12,
    'TPU v4': 275e12,
    'TPU v5 lite': 197e12,   # v5e
    'TPU v5e': 197e12,
    'TPU v5p': 459e12,
    'TPU v5': 459e12,
    'TPU v6 lite': 918e12,   # v6e / Trillium
    'TPU v6e': 918e12,
}


def _peak_flops(device_kind: str):
    # match the most specific key first
    for key, peak in sorted(PEAK_BF16_FLOPS.items(), key=lambda kv: -len(kv[0])):
        if device_kind.startswith(key):
            return peak
    return None


def _flops_from_cost_analysis(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float(ca.get('flops', 0.0)) if ca else 0.0


def _build(batch_size, cfg):
    import jax
    import jax.numpy as jnp
    from keypointfusion_tpu.data.synthetic import synthetic_batch
    from keypointfusion_tpu.models.kpfusion import KPFusion
    from keypointfusion_tpu.training.train_step import frame_from_batch

    np_batch = synthetic_batch(batch_size=batch_size,
                               point_num=cfg.point_num, seed=0)
    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    frame = frame_from_batch(batch, cfg)
    # serving mode: bf16 compute, fused Pallas DESA
    # (kernels/desa_dense_pallas.py) and fused point->pixel sampler
    # (kernels/pixel_sampler_pallas.py — replaces approx_min_k + densify)
    model = KPFusion(net=cfg.net, joint_num=cfg.joint_num,
                     dtype=jnp.bfloat16, fast_topk=True,
                     use_pallas_desa=True, use_pallas_sampler=True)
    # init must be jitted: eager flax init issues thousands of tiny
    # dispatches, which takes minutes over a high-latency device link
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch['rgb'],
                                    batch['depth'], batch['pcl'], frame)
    return model, variables, batch, frame


def _measure(batch_size, cfg):
    """Returns (chained_fps, blocking_median_fps, flops_per_frame)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    model, variables, batch, frame = _build(batch_size, cfg)
    rgb0, depth, pcl = batch['rgb'], batch['depth'], batch['pcl']

    def single(variables, rgb, depth, pcl, frame):
        results, _ = model.apply(variables, rgb, depth, pcl, frame)
        return results[-1]

    # FLOPs per batch from XLA's cost model on the actual executable.
    compiled = (jax.jit(single)
                .lower(variables, rgb0, depth, pcl, frame).compile())
    flops_per_frame = _flops_from_cost_analysis(compiled) / batch_size

    def chained(variables, rgb0, depth, pcl, frame):
        def step(rgb, _):
            out = single(variables, rgb, depth, pcl, frame)
            # Data dependence: iteration k+1's input is a function of
            # iteration k's output, so the iterations serialize inside
            # one dispatch. The perturbation is numerically negligible
            # but not removable at compile time (out is a runtime value).
            rgb_next = rgb + out.sum().astype(rgb.dtype) * jnp.asarray(
                1e-24, rgb.dtype)
            return rgb_next, ()
        final, _ = lax.scan(step, rgb0, None, length=ITERS)
        # return the LAST iteration's joints: a small [B,J,3] tensor that
        # depends on the entire chain; fetching it to host cannot complete
        # before every iteration has executed
        return single(variables, final, depth, pcl, frame)

    chained_c = (jax.jit(chained)
                 .lower(variables, rgb0, depth, pcl, frame).compile())

    # Warm up on a DIFFERENT input so the timed call can't be memoized.
    warm = rgb0 + jnp.asarray(7.0, rgb0.dtype)
    jax.device_get(chained_c(variables, warm, depth, pcl, frame))

    t0 = time.perf_counter()
    jax.device_get(chained_c(variables, rgb0, depth, pcl, frame))
    dt = time.perf_counter() - t0
    chained_fps = batch_size * (ITERS + 1) / dt

    # Cross-check: fetch per dispatch over distinct pre-staged inputs.
    inputs = [jax.device_put(rgb0 + jnp.asarray(float(i + 1), rgb0.dtype))
              for i in range(10)]
    jax.device_get(compiled(variables, warm, depth, pcl, frame))
    times = []
    for x in inputs:
        t0 = time.perf_counter()
        jax.device_get(compiled(variables, x, depth, pcl, frame))
        times.append(time.perf_counter() - t0)
    blocking_fps = batch_size / float(np.median(times))
    return chained_fps, blocking_fps, flops_per_frame


def _kernel_flops_per_frame(cfg):
    """Analytic FLOPs of the Pallas custom calls per frame — XLA's
    cost_analysis() cannot see inside custom calls, so without this the
    implied MFU silently drops when work moves into kernels.
    Shapes: N=point_num, M=N+J support, Mp its 128-pad, C=128, J joints,
    HW=1024 (32x32 feature maps), K_samp feature channels 2C+J."""
    j = cfg.joint_num
    n = cfg.point_num
    c = 128
    mp = -(-(n + j) // 128) * 128
    hw = 1024
    c_samp = 2 * c + j
    # sampler kernel: w@feat + the ones-normalizer matmul
    sampler = n * hw * (c_samp + 128) * 2
    # DESA kernel (x2 blocks): per scale — two [C,C]x[C,Mp] linear-term
    # dots + J per-joint [C,C]x[C,Mp] MLP dots (+ rank/fusion, minor)
    desa = 2 * (3 * (2 + j) * c * c * mp * 2)
    return (sampler + desa) / 1e9


def _measure_streaming(cfg, batch_size=64, n_batches=40, depth=8,
                       n_runs=5):
    """Full-pipeline streaming throughput: uint16/uint8 FULL frames in,
    world-mm joints out, on-device preprocessing included, double-buffered
    (serving.StreamingEngine). All inputs are DISTINCT pre-staged device
    buffers (no dispatch can be memoized) and every output is fetched to
    host. Pre-staging excludes the host->device link from the measurement:
    over this remote tunnel the link runs at ~1% of a production PCIe/DMA
    path, which would measure the tunnel, not the chip.

    Returns (median, min, max) over n_runs passes of one engine — host
    thread scheduling on this 1-core box spreads single passes over
    4.4-6.2k fps, so one sample is unrepresentative (round-3 verdict)."""
    import jax
    import numpy as np
    from keypointfusion_tpu.serving import StreamingEngine

    eng = StreamingEngine(cfg, batch_size=batch_size, img_hw=(480, 640),
                          use_pallas_desa=True, use_pallas_sampler=True)
    rng = np.random.RandomState(0)

    def make_batch():
        depth_f = np.zeros((batch_size, 480, 640), np.uint16)
        depth_f[:, 160:320, 240:400] = rng.randint(
            500, 700, (batch_size, 160, 160)).astype(np.uint16)
        rgb = rng.randint(0, 255, (batch_size, 480, 640, 3)
                          ).astype(np.uint8)
        centers = np.tile(np.array([[320, 240, 600]], np.float32),
                          (batch_size, 1))
        cube = np.full((batch_size, 3), 250, np.float32)
        cam = np.tile(np.array([[600, 600, 320, 240]], np.float32),
                      (batch_size, 1))
        return {'depth': depth_f, 'rgb': rgb, 'centers': centers,
                'cube': cube, 'cam': cam}

    staged = []
    for _ in range(n_batches + 2):
        staged.append({k: jax.device_put(v)
                       for k, v in make_batch().items()})
    # warmup: compile + fill the pipeline
    for _ in eng.process_stream(iter(staged[:2]), depth=depth):
        pass
    fps = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        n_out = 0
        for out in eng.process_stream(iter(staged[2:]), depth=depth):
            n_out += out['joint_xyz_mm'].shape[0]
        dt = time.perf_counter() - t0
        fps.append(n_out / dt)
    return float(np.median(fps)), float(min(fps)), float(max(fps))


def _measure_training(batch_size, cfg, group=16):
    """Training-step throughput via the production dispatch shape
    (Config.steps_per_dispatch): ONE dispatch of a lax.scan chain of
    `group` optimizer steps over `group` DISTINCT stacked batches. The
    carry is the TrainState itself, so steps serialize on-device and
    cannot be elided/memoized; the clock stops on a host fetch of the
    final loss. This measures device compute — the per-step python-loop
    number (reported as *_perstep_dispatch) additionally pays host/tunnel
    dispatch latency, which on this remote link exceeded the step's
    compute (artifacts/train_profile_r04_bs64.json: 56-123 ms/step
    python-loop vs ~33 ms device at bs=64)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from keypointfusion_tpu.data.synthetic import synthetic_batch
    from keypointfusion_tpu.training.train_step import (
        create_train_state, make_train_step, make_train_step_scan,
    )

    batches = [synthetic_batch(batch_size=batch_size,
                               point_num=cfg.point_num, seed=s)
               for s in range(group)]
    stacked = {k: jnp.asarray(np.stack([b[k] for b in batches]))
               for k in batches[0]}
    batch0 = {k: jnp.asarray(batches[0][k]) for k in batches[0]}
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch0,
                               steps_per_epoch=100)
    scan = make_train_step_scan(cfg)
    rngs = jax.random.split(jax.random.PRNGKey(1), group)
    rngs2 = jax.random.split(jax.random.PRNGKey(2), group)
    ep = jnp.zeros((), jnp.int32)
    state, m = scan(state, stacked, rngs, ep)     # compile + warm
    jax.device_get(m['loss'])
    t0 = time.perf_counter()
    state, m = scan(state, stacked, rngs2, ep)    # chained: new state in
    jax.device_get(m['loss'])
    dt = time.perf_counter() - t0
    scan_ms = dt / group * 1000.0

    # cross-check: classic per-step dispatch (includes host latency)
    step = make_train_step(cfg)
    psteps = 6
    st, m = step(state, batch0, rngs[0], ep)
    jax.device_get(m['loss'])
    t0 = time.perf_counter()
    for i in range(psteps):
        st, m = step(st, batch0, rngs[i % group], ep)
    jax.device_get(m['loss'])
    perstep_ms = (time.perf_counter() - t0) / psteps * 1000.0
    return scan_ms, batch_size / scan_ms * 1000.0, perstep_ms


def _measure_train_e2e(cfg, bs=64, group=16, steps=32, frames=192):
    """End-to-end training: real BatchLoader workers over an on-disk
    synthetic dataset (eval-mode pipeline: the C++ crop/normalize/pcl
    core) feeding the scan train step, loader + H2D + step overlapped
    (round-4 verdict #6: all other train rows are pre-staged synthetic
    batches). Reuses scripts/tpu_train_e2e_bench.py's machinery."""
    import shutil
    import sys
    import tempfile

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'scripts'))
    from tpu_train_e2e_bench import DiskDataset, measure, write_frames

    # group=16 matches _measure_training(64)'s scan length, so this row
    # reuses that executable (fresh compiles are minutes on this link)

    tmp = tempfile.mkdtemp(prefix='kpf_bench_e2e_')
    try:
        write_frames(tmp, frames)
        ds = DiskDataset(tmp, frames, train=False)
        sps, ms_step, _ = measure(ds, bs, group, steps, cfg)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # host memcpy bandwidth contextualizes the row: a bs=64 group is
    # ~280 MB and the chip consumes it at ~540 MB/s, so a host below
    # ~1 GB/s is the binding constraint regardless of loader design
    # (this measurement VM: ~0.15 GB/s; production hosts: 10+ GB/s)
    blk = np.zeros((128, 1000, 1000), np.uint8)
    t0 = time.perf_counter()
    _ = blk.copy()
    host_gbps = blk.nbytes / (time.perf_counter() - t0) / 1e9
    return sps, ms_step, host_gbps


def main():
    import jax
    from keypointfusion_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    from keypointfusion_tpu.config import Config

    cfg = Config(compute_dtype='bfloat16')
    device_kind = jax.devices()[0].device_kind
    peak = _peak_flops(device_kind)

    fps256, fps256_blocking, flops_frame = _measure(256, cfg)
    fps64, fps64_blocking, _ = _measure(64, cfg)
    stream64_med, stream64_min, stream64_max = _measure_streaming(
        cfg.replace(fast_topk=True))
    stream256_med, _, _ = _measure_streaming(
        cfg.replace(fast_topk=True), batch_size=256, n_batches=10,
        n_runs=3)

    # training: the RECOMMENDED production config — full bf16 (matches
    # f32's final error across 3 seeds with the tightest spread,
    # artifacts/precision_training_r05.json), per-leaf optimizer updates
    # (flatten_opt=False: -4.4 ms/step of ravel traffic,
    # artifacts/train_trace_r05_bs64_leafopt.json), approx neighbor
    # selection (exact stays the parity-eval default). Rounds <= 4
    # measured 'mixed'+flattened here; the step-by-step deltas between
    # the two configs are the committed trace artifacts (62.4 -> 50.2
    # rank-matmul -> 47.6 sampler-precision -> 45.7 per-leaf -> 32.5
    # bf16, all bs=64).
    tcfg = Config(compute_dtype='bfloat16', fast_topk=True,
                  flatten_opt=False)
    train_ms64, train_sps64, train_ms64_ps = _measure_training(64, tcfg)
    train_ms256, train_sps256, _ = _measure_training(256, tcfg, group=8)
    e2e_sps64, e2e_ms64, e2e_host_gbps = _measure_train_e2e(tcfg)

    # ConvNeXt-T — the reference's headline backbone family
    # (/root/reference/convNeXT/resnetUnet.py:60-248)
    ccfg = Config(net='KPFusion-convnext-T', compute_dtype='bfloat16')
    cnx_fps256, cnx_fps256_blocking, cnx_flops = _measure(256, ccfg)
    cnx_fps64, _, _ = _measure(64, ccfg)
    ctcfg = Config(net='KPFusion-convnext-T', compute_dtype='bfloat16',
                   fast_topk=True, flatten_opt=False)
    cnx_train_ms64, cnx_train_sps64, _ = _measure_training(64, ctcfg,
                                                           group=8)

    kernel_gf = _kernel_flops_per_frame(cfg)
    total_gf = flops_frame / 1e9 + kernel_gf
    mfu = (flops_frame * fps256 / peak) if peak else None
    mfu_total = (total_gf * 1e9 * fps256 / peak) if peak else None
    print(json.dumps({
        "metric": "rgbd_frames_per_sec_per_chip_bs256",
        "value": round(fps256, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps256 / BASELINE_FPS, 3),
        "method": f"one dispatch of a {ITERS}-step data-dependent scan",
        "device_kind": device_kind,
        "flops_per_frame_gflop": round(flops_frame / 1e9, 3),
        "kernel_flops_per_frame_gflop": round(kernel_gf, 3),
        "implied_mfu": round(mfu, 4) if mfu is not None else None,
        "implied_mfu_incl_kernels": round(mfu_total, 4)
        if mfu_total is not None else None,
        "peak_bf16_flops": peak,
        "bs256_blocking_fps": round(fps256_blocking, 1),
        "bs64_chained_fps": round(fps64, 1),
        "bs64_blocking_fps": round(fps64_blocking, 1),
        "streaming_fps_bs64_median": round(stream64_med, 1),
        "streaming_fps_bs64_min": round(stream64_min, 1),
        "streaming_fps_bs64_max": round(stream64_max, 1),
        "streaming_fps_bs256_median": round(stream256_med, 1),
        "train_config": "bfloat16 + per-leaf opt (recommended; rounds<=4 "
                        "measured mixed+flattened)",
        "train_ms_per_step_bs64": round(train_ms64, 2),
        "train_samples_per_sec_bs64": round(train_sps64, 1),
        "train_ms_per_step_bs64_perstep_dispatch": round(train_ms64_ps, 2),
        "train_ms_per_step_bs256": round(train_ms256, 2),
        "train_samples_per_sec_bs256": round(train_sps256, 1),
        "train_e2e_samples_per_sec_bs64": round(e2e_sps64, 1),
        "train_e2e_ms_per_step_bs64": round(e2e_ms64, 2),
        "train_e2e_host_memcpy_gb_per_s": round(e2e_host_gbps, 3),
        "convnext_t_fps_bs256": round(cnx_fps256, 1),
        "convnext_t_fps_bs256_blocking": round(cnx_fps256_blocking, 1),
        "convnext_t_fps_bs64": round(cnx_fps64, 1),
        "convnext_t_flops_per_frame_gflop": round(cnx_flops / 1e9, 3),
        "convnext_t_train_ms_per_step_bs64": round(cnx_train_ms64, 2),
        "convnext_t_train_samples_per_sec_bs64": round(cnx_train_sps64, 1),
    }))


if __name__ == '__main__':
    main()
