"""Train a real ESPCN and export it through the official conversion path.

The reference gates ESPCN against a Keras ground truth built from trained
weights (demo/test_espcn.sh:45-57, demo/modelInferenceESPCN.py:48-70).
This container has no network egress, so the trained artifact is produced
in-repo: a Keras ESPCN (same architecture as the reference script) is
trained on procedurally generated super-resolution pairs, saved as H5,
converted with tools/convert.py (the same path a user's artifact takes),
and serialized to the reference JSON+bin artifact format.

The synthetic distribution (smooth sinusoid fields + sharp discs/edges)
has genuine high-frequency content, so a trained 2x upsampler measurably
beats bicubic/bilinear interpolation on held-out samples — giving the
accuracy tests a real PSNR gate instead of seeded-random weights.

Usage:
  python -m shadernn_tpu.tools.train_espcn [--steps 3000] [--out DIR]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

ARTIFACT_DIR = os.path.join(os.path.dirname(__file__), "..", "models", "artifacts")


def synth_hr(rng: np.random.Generator, n: int, s: int) -> np.ndarray:
    """n synthetic HR luma patches (s x s x 1) in [0, 1].

    Edge-dense by design: hard-edged discs, rotated bars, and thin lines —
    the content where a learned 2x upsampler beats interpolation (linear
    filters must blur a step edge; a trained prior re-sharpens it). A
    couple of low-frequency gratings provide smooth context."""
    yy, xx = np.mgrid[0:s, 0:s] / float(s)
    out = np.empty((n, s, s, 1), np.float32)
    for i in range(n):
        img = np.zeros((s, s), np.float64)
        for _ in range(2):
            fx, fy = rng.uniform(0.5, 3.0, 2)
            ph = rng.uniform(0, 2 * np.pi)
            img += rng.uniform(0.05, 0.2) * np.sin(2 * np.pi * (fx * xx + fy * yy) + ph)
        for _ in range(10):  # hard-edged discs
            cx, cy = rng.uniform(0.0, 1.0, 2)
            r = rng.uniform(0.02, 0.2)
            img[(xx - cx) ** 2 + (yy - cy) ** 2 < r * r] += rng.uniform(-0.7, 0.7)
        for _ in range(8):  # rotated bars / thin lines
            th = rng.uniform(0, np.pi)
            d = (xx - rng.uniform(0, 1)) * np.cos(th) + (yy - rng.uniform(0, 1)) * np.sin(th)
            img[np.abs(d) < rng.uniform(0.004, 0.05)] += rng.uniform(-0.7, 0.7)
        lo, hi = img.min(), img.max()
        out[i, :, :, 0] = ((img - lo) / (hi - lo + 1e-6)).astype(np.float32)
    return out


def downsample2(hr: np.ndarray) -> np.ndarray:
    """2x box downsample (the LR degradation model)."""
    n, h, w, c = hr.shape
    return hr.reshape(n, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4)).astype(np.float32)


def bilinear_up2(lr: np.ndarray) -> np.ndarray:
    """Bilinear 2x upsample baseline (PIL, per image)."""
    from PIL import Image

    ups = []
    for img in lr[..., 0]:
        im = Image.fromarray((img * 255).astype(np.uint8))
        im = im.resize((img.shape[1] * 2, img.shape[0] * 2), Image.BILINEAR)
        ups.append(np.asarray(im, np.float32) / 255.0)
    return np.stack(ups)[..., None]


def _depth_to_space_2x(t):
    # Module-level and closure-free so Keras 3 can deepcopy/serialize the
    # Lambda config (a closure over the tf module is unpicklable).
    import tensorflow as tf

    return tf.nn.depth_to_space(t, 2)


def build_keras_espcn(scale: int = 2):
    """The reference training architecture (demo/modelInferenceESPCN.py)."""
    from keras.layers import Activation, Conv2D, Input, Lambda
    from keras.models import Model

    assert scale == 2, "trained artifact is the reference 2x config"
    inp = Input(shape=(None, None, 1), name="input")
    x = Conv2D(16, 5, padding="same", activation="relu", name="conv_1")(inp)
    x = Conv2D(16, 3, padding="same", activation="relu", name="conv_2")(x)
    x = Conv2D(scale ** 2, 3, padding="same", name="conv_3")(x)
    x = Lambda(_depth_to_space_2x, name="subpixel")(x)
    x = Activation("tanh", name="tanh_out")(x)
    return Model(inp, x, name="ESPCN_2X_16_16_4")


def train(steps: int = 6000, batch: int = 32, patch: int = 64, seed: int = 0,
          log=print):
    """`steps` counts actual gradient steps (batches seen)."""
    import keras

    rng = np.random.default_rng(seed)
    model = build_keras_espcn()
    opt = keras.optimizers.Adam(keras.optimizers.schedules.CosineDecay(2e-3, steps))
    model.compile(optimizer=opt, loss="mse")
    n_pool = 4096  # fixed pool, regenerated every pass (cheap, endless data)
    done = 0
    while done < steps:
        hr = synth_hr(rng, n_pool, patch)
        lr = downsample2(hr)
        epoch_steps = min(n_pool // batch, steps - done)
        model.fit(lr[: epoch_steps * batch], hr[: epoch_steps * batch],
                  batch_size=batch, epochs=1, verbose=0, shuffle=False)
        done += epoch_steps
        loss = float(model.evaluate(lr[:256], hr[:256], verbose=0))
        log(f"step {done}: mse {loss:.5f}")
    return model


def psnr(a, b, max_val=1.0):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 10.0 * np.log10(max_val ** 2 / max(mse, 1e-12))


def evaluate(model, seed: int = 123, n: int = 8, size: int = 128, log=print):
    rng = np.random.default_rng(seed)
    hr = synth_hr(rng, n, size)
    lr = downsample2(hr)
    pred = np.asarray(model.predict(lr, verbose=0))
    base = bilinear_up2(lr)
    c = 8  # crop conv borders, standard SR practice
    p_model = psnr(pred[:, c:-c, c:-c], hr[:, c:-c, c:-c])
    p_base = psnr(base[:, c:-c, c:-c], hr[:, c:-c, c:-c])
    log(f"held-out PSNR (crop {c}): espcn {p_model:.2f} dB vs bilinear {p_base:.2f} dB")
    return p_model, p_base


def export(model, out_dir: str, log=print) -> str:
    """H5 -> (convert.py) -> Graph -> reference JSON+bin artifact."""
    from shadernn_tpu.graph.serialize import save_model
    from shadernn_tpu.tools.convert import convert_keras

    os.makedirs(out_dir, exist_ok=True)
    h5 = os.path.join(out_dir, "espcn_2x_trained.h5")
    model.save(h5)
    # The model trains on dynamic H/W; the artifact pins the reference's
    # 540p benchmark geometry (BASELINE.json configs[0]). Engine.from_json
    # re-infers shapes for whatever frame size the user runs.
    graph = convert_keras(model, input_hw=(540, 960))
    path = os.path.join(out_dir, "espcn_2x_trained.json")
    save_model(graph, path, decouple=True)
    log(f"saved {h5} and {path} (+ .bin)")
    return path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--out", default=ARTIFACT_DIR)
    args = ap.parse_args(argv)
    model = train(steps=args.steps)
    p_model, p_base = evaluate(model)
    assert p_model > p_base + 0.5, (
        f"trained ESPCN ({p_model:.2f} dB) must beat bilinear ({p_base:.2f} dB)"
    )
    export(model, args.out)


if __name__ == "__main__":
    main()
