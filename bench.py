"""Benchmark: end-to-end CTPN inference throughput on the available chip(s).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": R, ...}

Measures the full detection pipeline (mean-subtract -> VGG16 bf16 -> BiLSTM
-> heads -> on-device proposal decode with NMS -> text connector) at the
600x900 target geometry (padded bucket 608x912), batched.

The headline number runs REAL content through TRAINED weights (the
committed artifact on the reference demo photographs + synthetic scene-text
renders): NMS sweep counts, the fused kernel's early-exit point and the
connector's closure rounds are all data-dependent, and real text produces
the clustered high-scoring proposals that random noise does not. A
random-noise/random-weights row is also measured for comparison
(``noise_imgs_per_sec``); set BENCH_CONTENT=noise to make it the headline
(e.g. when the artifact is absent).

Baseline: BASELINE.json targets >= 1000 images/sec on a v5e-8 (8 chips) =
125 images/sec/chip; vs_baseline = measured_per_chip / 125.

Driver-proofing: the measurement itself runs in a supervised child
process. Backend init (the axon TPU tunnel) can be transiently
UNAVAILABLE — round 3's driver capture died on a bare traceback from
exactly that. The supervisor retries the child (default 3 attempts, 30 s
backoff, fresh process each time so no poisoned backend cache), and on
persistent failure prints ONE parseable JSON line with ``value: null``
and the error, exiting 0 — the driver always gets a JSON line.
"""

import glob
import json
import os
import os.path as osp
import sys
import time

import numpy as np

ROOT = osp.dirname(osp.abspath(__file__))
ARTIFACT = osp.join(ROOT, "data", "artifacts", "ctpn_synth_f16.npz")
REF_DEMO = "/root/reference/data/demo"


def _real_batch(batch: int, bh: int, bw: int):
    """(batch, bh, bw, 3) uint8 real-content images + per-image im_info.

    Even slots take reference demo photographs cycled (when the reference
    tree exists); odd slots take seeded synthetic scene-text renders —
    deterministic, every frame contains actual text, and the mix keeps
    per-frame proposal statistics varied at any batch size.
    """
    from ctpn_tpu.data.synth import render_image
    from ctpn_tpu.utils.image import load_image_bgr, prep_image

    sources = []
    for p in sorted(glob.glob(osp.join(REF_DEMO, "*"))):
        try:
            sources.append(load_image_bgr(p))
        except Exception:
            pass
    rng = np.random.RandomState(11)
    images, infos = [], []
    for i in range(batch):
        if sources and i % 2 == 0:
            im = sources[(i // 2) % len(sources)]
        else:
            arr, _ = render_image(rng, width=900, height=600)
            im = arr[..., ::-1]  # RGB -> BGR
        data, info, _pad = prep_image(im, bucket=(bh, bw))
        images.append(data)
        infos.append(info)
    return np.stack(images), np.stack(infos)


def _artifact_fingerprint() -> str:
    """Provenance of the weights behind the headline number: short content
    hash of the committed artifact, so an artifact swap between rounds is
    visible in BENCH_r*.json instead of silently moving the measurement."""
    import hashlib

    h = hashlib.sha256()
    with open(ARTIFACT, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return f"ctpn_synth_f16.npz:{h.hexdigest()[:12]}"


def _noise_batch(batch: int, bh: int, bw: int):
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (batch, bh, bw, 3)).astype(np.uint8)
    infos = np.tile(np.array([600, 900, 1.0], np.float32), (batch, 1))
    return images, infos


def _time_detect(detect, params, images, infos, iters):
    import jax.numpy as jnp

    images = jnp.asarray(images)
    infos = jnp.asarray(infos)
    # warmup / compile (fetch a value — block_until_ready alone does not
    # force execution on tunnel backends)
    _, lines = detect(params, images, infos)
    np.asarray(lines.count)
    t0 = time.perf_counter()
    for _ in range(iters):
        _, lines = detect(params, images, infos)
    np.asarray(lines.count)
    return time.perf_counter() - t0


def main():
    import jax

    # testing hook: a sitecustomize module on this machine force-registers
    # the TPU tunnel platform even over JAX_PLATFORMS=cpu; pin it back
    # before any backend initializes (same trick as tests/conftest.py)
    plat = os.environ.get("BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    import jax.numpy as jnp

    from ctpn_tpu.inference.pipeline import build_detect_fn
    from ctpn_tpu.models.factory import get_network
    from ctpn_tpu.utils.compilation import ensure_compilation_cache
    from ctpn_tpu.utils.weights import load_params

    # A/B hook: space-separated KEY VALUE pairs applied to the global cfg
    # (e.g. BENCH_CFG_SET="TPU.PACKED_STEM False" to time the stock stem)
    sets = os.environ.get("BENCH_CFG_SET")
    if sets:
        from ctpn_tpu.config import cfg_from_list

        cfg_from_list(sets.split())

    ensure_compilation_cache()

    n_dev = jax.device_count()
    backend = jax.default_backend()

    bh, bw = 608, 912
    # batch 48 is the single-chip throughput sweet spot (docs/PERFORMANCE.md)
    batch = int(os.environ.get("BENCH_BATCH", "48" if backend == "tpu" else "2"))
    iters = int(os.environ.get("BENCH_ITERS", "14" if backend == "tpu" else "2"))
    content = os.environ.get("BENCH_CONTENT", "real")
    if content not in ("real", "noise"):
        sys.exit(f"BENCH_CONTENT must be 'real' or 'noise', got {content!r}")
    if content == "real" and not osp.exists(ARTIFACT):
        content = "noise"

    model = get_network("VGGnet_test")
    detect = jax.jit(build_detect_fn(model, mode="H"))

    rand_params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, bh, bw, 3), jnp.float32)
    )["params"]

    results = {}
    noise_images, noise_infos = _noise_batch(batch, bh, bw)
    dt = _time_detect(detect, rand_params, noise_images, noise_infos, iters)
    results["noise"] = batch * iters / dt

    if content == "real":
        real_params = load_params(ARTIFACT)
        real_images, real_infos = _real_batch(batch, bh, bw)
        dt = _time_detect(detect, real_params, real_images, real_infos, iters)
        results["real"] = batch * iters / dt

    imgs_per_sec = results[content]
    per_chip = imgs_per_sec / max(
        1, len({d for d in jax.devices() if d.platform != "cpu"}) or 1
    )
    target_per_chip = 1000.0 / 8.0
    line = {
        "metric": METRIC,
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(per_chip / target_per_chip, 4),
        "content": content,
    }
    if content == "real":
        line["noise_imgs_per_sec"] = round(results["noise"], 2)
        line["artifact"] = _artifact_fingerprint()
    print(json.dumps(line))
    print(
        f"# backend={backend} devices={n_dev} batch={batch} iters={iters} "
        f"content={content} per_chip={per_chip:.1f} img/s "
        f"all={ {k: round(v, 1) for k, v in results.items()} }",
        file=sys.stderr,
    )


METRIC = "ctpn_e2e_inference_throughput_600x900"


def _supervise() -> int:
    """Run the measurement in a child process with bounded retries.

    A fresh process per attempt sidesteps any poisoned in-process JAX
    backend cache after a tunnel failure. Success = the child printed a
    JSON object line with a "metric" key; that line is relayed verbatim.
    After the retries are exhausted (or the child hangs past the
    per-attempt timeout), print one JSON line with value null + the error
    and exit 0 so the driver always parses something.
    """
    import subprocess

    attempts = max(1, int(os.environ.get("BENCH_RETRIES", "3")))
    backoff = float(os.environ.get("BENCH_BACKOFF_S", "30"))
    child_timeout = float(os.environ.get("BENCH_CHILD_TIMEOUT_S", "1800"))
    env = dict(os.environ, CTPN_BENCH_CHILD="1")
    last_err = "no attempts ran"
    for attempt in range(attempts):
        if attempt:
            print(
                f"# bench attempt {attempt} failed; retrying in {backoff:.0f}s:"
                f" {last_err[-300:]}",
                file=sys.stderr,
            )
            time.sleep(backoff)
        try:
            proc = subprocess.run(
                [sys.executable, osp.abspath(__file__)],
                capture_output=True,
                text=True,
                env=env,
                timeout=child_timeout,
            )
        except subprocess.TimeoutExpired:
            last_err = f"child timed out after {child_timeout:.0f}s"
            continue
        if proc.stderr:
            sys.stderr.write(proc.stderr)
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                obj = json.loads(line)
            except (json.JSONDecodeError, ValueError):
                continue
            if isinstance(obj, dict) and "metric" in obj:
                print(line)
                return 0
        tail = (proc.stderr or proc.stdout or "").strip().splitlines()
        # prefer lines that look like actual error text over traceback
        # scaffolding/ASCII art (an HBM OOM's message sits mid-trace)
        salient = [l for l in tail if any(
            k in l for k in ("Error", "ERROR", "error:", "INTERNAL",
                             "RESOURCE", "Ran out of memory"))]
        pick = (salient or tail)[-6:]
        last_err = " | ".join(pick) if pick else f"rc={proc.returncode}, no output"
    print(
        json.dumps(
            {
                "metric": METRIC,
                "value": None,
                "unit": "images/sec",
                "vs_baseline": None,
                "error": last_err[-600:],
            }
        )
    )
    return 0


if __name__ == "__main__":
    if os.environ.get("CTPN_BENCH_CHILD") == "1":
        main()
    else:
        sys.exit(_supervise())
