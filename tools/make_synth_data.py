"""Generate synthetic multi-degradation training/validation trees.

The real datasets (Rain100L / BSD68 / SOTS) are not in this sandbox, so
convergence evidence runs on synthetic trees that follow the reference's
exact folder/manifest/GT-path conventions (reference: util/dataset_utils.py:
79-206 manifests + oversampling; :177-186 GT-path rules) — the same trees the
unit tests use, at training scale.

Clean images are low-frequency Fourier textures plus random shapes (enough
structure to make restoration learnable). Degradations:
- derain: additive diagonal rain streaks  -> Derain/rainy/rain-N.png vs
  Derain/gt/norain-N.png, manifest rainy/rainTrain.txt
- dehaze: I = J*t + A*(1-t) with a random depth ramp ->
  Dehaze/synthetic/<p>_hazy.png vs Dehaze/original/<p>.png, manifest
  hazy/hazy_outside.txt
- denoise: clean images only (noise synthesized on-device at train/test
  time) -> Denoise/*.png, manifest noisy/denoise.txt
Validation folders: val/<task>/{input,target}/ paired full-res images.

Usage: python tools/make_synth_data.py --root /tmp/rcot_data [--n 24]
"""

import argparse
import os

import numpy as np
from PIL import Image


def synth_clean(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Low-frequency random texture + shapes, uint8 HWC."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w, 3), np.float32)
    for _ in range(6):
        fy, fx = rng.uniform(0.5, 4.0, 2)
        phase = rng.uniform(0, 2 * np.pi, 3)
        amp = rng.uniform(0.1, 0.35)
        wave = np.sin(2 * np.pi * (fy * yy / h + fx * xx / w))[..., None]
        img += amp * np.cos(wave * np.pi + phase)
    for _ in range(5):  # random soft rectangles
        y0, x0 = rng.integers(0, h // 2), rng.integers(0, w // 2)
        hh, ww = rng.integers(h // 8, h // 2), rng.integers(w // 8, w // 2)
        img[y0:y0 + hh, x0:x0 + ww] += rng.uniform(-0.5, 0.5, 3)
    img = (img - img.min()) / (np.ptp(img) + 1e-6)
    return (img * 255).astype(np.uint8)


def add_rain(rng, img: np.ndarray) -> np.ndarray:
    h, w, _ = img.shape
    rain = np.zeros((h, w), np.float32)
    n = rng.integers(80, 160)
    length = rng.integers(8, 20)
    slope = rng.uniform(-0.4, 0.4)
    for _ in range(n):
        y, x = rng.integers(0, h), rng.integers(0, w)
        for t in range(length):
            yy, xx = int(y + t), int(x + t * slope)
            if 0 <= yy < h and 0 <= xx < w:
                rain[yy, xx] += rng.uniform(0.4, 1.0)
    rainy = img.astype(np.float32) + rain[..., None] * 180.0
    return np.clip(rainy, 0, 255).astype(np.uint8)


def add_haze(rng, img: np.ndarray) -> np.ndarray:
    h, w, _ = img.shape
    a = rng.uniform(200, 255)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    theta = rng.uniform(0, 2 * np.pi)
    depth = (np.cos(theta) * yy / h + np.sin(theta) * xx / w)
    depth = (depth - depth.min()) / (np.ptp(depth) + 1e-6)
    t = np.exp(-rng.uniform(0.8, 2.2) * (0.3 + depth))[..., None]
    hazy = img.astype(np.float32) * t + a * (1 - t)
    return np.clip(hazy, 0, 255).astype(np.uint8)


def add_blur(rng, img: np.ndarray, fixed: bool = False) -> np.ndarray:
    """Motion-ish blur: directional box kernel via repeated shifted adds.

    fixed=True uses one deterministic kernel for every image — a much easier
    (non-blind) deblurring task, for convergence-evidence runs on tiny
    synthetic sets where per-image random kernels are genuinely blind."""
    if fixed:
        length, slope = 7, 0.5
    else:
        length = int(rng.integers(5, 12))
        slope = rng.uniform(-1.0, 1.0)
    acc = np.zeros_like(img, np.float32)
    # zero-centered kernel: offsets straddle 0 so the blurred image is NOT
    # translated relative to the sharp target (an earlier uncentered version
    # shifted the centroid ~(length-1)/2 px, silently adding a translation
    # the model had to learn on top of the blur)
    for t in range(length):
        tc = t - length // 2
        dy, dx = tc, int(round(tc * slope))
        acc += np.roll(np.roll(img.astype(np.float32), dy, 0), dx, 1)
    return np.clip(acc / length, 0, 255).astype(np.uint8)


def add_lowlight(rng, img: np.ndarray) -> np.ndarray:
    """Darken: gamma + gain + mild noise (LOL-style appearance)."""
    gamma = rng.uniform(1.8, 3.0)
    gain = rng.uniform(0.15, 0.4)
    x = (img.astype(np.float32) / 255.0) ** gamma * gain
    x = x + rng.normal(0, 0.01, img.shape)
    return np.clip(x * 255.0, 0, 255).astype(np.uint8)


def save(path: str, img: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(img).save(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--n", type=int, default=24, help="train images per task")
    ap.add_argument("--n-val", type=int, default=8)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--blur-fixed", action="store_true",
                    help="one deterministic blur kernel for all images")
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    r = args.root

    rain_names, noise_names, haze_names = [], [], []
    for i in range(args.n + args.n_val):
        h = int(rng.integers(10, 16)) * 16
        w = int(rng.integers(10, 16)) * 16
        clean = synth_clean(rng, h, w)
        val = i >= args.n
        # derain
        rainy = add_rain(rng, clean)
        if val:
            k = i - args.n
            # target named per the reference GT rule input 'rain-N' ->
            # target 'norain-N' (util/dataset_utils.py:383-388) so BOTH the
            # trainer's sorted-glob eval (tester.py:55-58 semantics) and
            # DerainDehazeDataset._gt_path resolve it. Round-3 phase 4 died
            # on the same-name scheme here (perf/r3_phase4.log).
            save(f"{r}/val/derain/input/rain-{k}.png", rainy)
            save(f"{r}/val/derain/target/norain-{k}.png", clean)
        else:
            save(f"{r}/Derain/rainy/rain-{i}.png", rainy)
            save(f"{r}/Derain/gt/norain-{i}.png", clean)
            rain_names.append(f"rainy/rain-{i}.png")
        # dehaze
        hazy = add_haze(rng, clean)
        if val:
            k = i - args.n
            # reference dehaze GT rule: input '<p>_hazy' -> target '<p>.png'
            # (util/dataset_utils.py:389-393)
            save(f"{r}/val/dehaze/input/h{k}_hazy.png", hazy)
            save(f"{r}/val/dehaze/target/h{k}.png", clean)
        else:
            save(f"{r}/Dehaze/synthetic/h{i}_hazy.png", hazy)
            save(f"{r}/Dehaze/original/h{i}.png", clean)
            haze_names.append(f"synthetic/h{i}_hazy.png")
        # deblur: <dir>/{blur,sharp}/<same name> (data/datasets.py:103-107)
        blurred = add_blur(rng, clean, fixed=args.blur_fixed)
        if val:
            k = i - args.n
            save(f"{r}/val/deblur/input/img-{k}.png", blurred)
            save(f"{r}/val/deblur/target/img-{k}.png", clean)
        else:
            save(f"{r}/Deblur/blur/img-{i}.png", blurred)
            save(f"{r}/Deblur/sharp/img-{i}.png", clean)
        # lowlight: <dir>/{low,high}/<same name> (data/datasets.py:108-112)
        dark = add_lowlight(rng, clean)
        if val:
            k = i - args.n
            save(f"{r}/val/lowlight/input/img-{k}.png", dark)
            save(f"{r}/val/lowlight/target/img-{k}.png", clean)
        else:
            save(f"{r}/Lowlight/low/img-{i}.png", dark)
            save(f"{r}/Lowlight/high/img-{i}.png", clean)
        # denoise (clean only; noise is synthesized on-device / at test time)
        if val:
            k = i - args.n
            save(f"{r}/val/denoise/target/img-{k}.png", clean)
        else:
            save(f"{r}/Denoise/img-{i}.png", clean)
            noise_names.append(f"img-{i}.png")

    os.makedirs(f"{r}/manifests/rainy", exist_ok=True)
    os.makedirs(f"{r}/manifests/noisy", exist_ok=True)
    os.makedirs(f"{r}/manifests/hazy", exist_ok=True)
    with open(f"{r}/manifests/rainy/rainTrain.txt", "w") as f:
        f.write("\n".join(rain_names) + "\n")
    with open(f"{r}/manifests/noisy/denoise.txt", "w") as f:
        f.write("\n".join(noise_names) + "\n")
    with open(f"{r}/manifests/hazy/hazy_outside.txt", "w") as f:
        f.write("\n".join(haze_names) + "\n")
    print(f"synthetic tree at {r}: {args.n} train + {args.n_val} val per task")


if __name__ == "__main__":
    main()
