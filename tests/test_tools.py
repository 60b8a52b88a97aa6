"""Tool tests: Keras conversion (cross-framework oracle — the reference's
tier-3 check, test_espcn.sh comparing engine output against the original
Keras model), dump reader, and comparison utilities."""

import os

import numpy as np
import pytest

import oracle
from shadernn_tpu.config import EngineOptions
from shadernn_tpu.engine.compile import compile_graph
from shadernn_tpu.engine.engine import Engine

keras = pytest.importorskip("keras")


def _build_reference_espcn(scale=2):
    """The reference's exact Keras ESPCN (demo/modelInferenceESPCN.py:48-70)."""
    import tensorflow as tf
    from keras.layers import Activation, Conv2D, Input, Lambda
    from keras.models import Model

    inputs = Input(shape=(32, 48, 1), name="input")
    x = Conv2D(16, (5, 5), padding="same", activation="relu", name="conv_1")(inputs)
    x = Conv2D(16, (3, 3), padding="same", activation="relu", name="conv_2")(x)
    x = Conv2D(scale**2, (3, 3), padding="same", name="conv_3")(x)
    x = Lambda(lambda t: tf.nn.depth_to_space(t, scale), name="subpixel")(x)
    x = Activation("tanh")(x)
    return Model(inputs=inputs, outputs=x)


def test_convert_keras_espcn_matches_keras_predict(rng, fp32_threshold):
    from shadernn_tpu.tools.convert import convert_keras

    km = _build_reference_espcn()
    g = convert_keras(km)
    g.infer_shapes()
    x = rng.random((1, 32, 48, 1), dtype=np.float32)
    want = km.predict(x, verbose=0)
    got = np.asarray(compile_graph(g, EngineOptions()).run_single(x))
    oracle.compare(got, want, fp32_threshold, "keras-espcn")


def test_convert_keras_classifier_with_bn(rng, fp32_threshold):
    from keras.layers import (
        Add, BatchNormalization, Conv2D, Dense, Flatten, Input, MaxPooling2D, ReLU,
    )
    from keras.models import Model

    from shadernn_tpu.tools.convert import convert_keras

    inputs = Input(shape=(16, 16, 3), name="input")
    c1 = Conv2D(8, 3, padding="same", use_bias=False, name="c1")(inputs)
    b1 = BatchNormalization(name="b1")(c1)
    r1 = ReLU(name="r1")(b1)
    c2 = Conv2D(8, 3, padding="same", name="c2")(r1)
    a = Add(name="a")([r1, c2])
    p = MaxPooling2D(2, name="p")(a)
    f = Flatten(name="f")(p)
    out = Dense(10, activation="softmax", name="d")(f)
    km = Model(inputs=inputs, outputs=out)
    # give BN non-trivial statistics
    bn = km.get_layer("b1")
    bn.set_weights([
        rng.random(8).astype(np.float32) + 0.5,
        rng.standard_normal(8).astype(np.float32),
        rng.standard_normal(8).astype(np.float32) * 0.1,
        rng.random(8).astype(np.float32) + 0.5,
    ])

    g = convert_keras(km)
    g.infer_shapes()
    x = rng.random((2, 16, 16, 3), dtype=np.float32)
    want = km.predict(x, verbose=0)
    got = np.asarray(compile_graph(g, EngineOptions()).run_single(x))
    oracle.compare(got, want, fp32_threshold, "keras-classifier")


def test_convert_h5_cli_roundtrip(tmp_path, rng, fp32_threshold):
    """Full offline path: keras save -> CLI convert -> Engine.from_json
    (the reference's convertTool.py -f model.h5 flow). Uses a conv net
    without Lambda (Keras 3 cannot serialize tf-closure Lambdas to H5;
    Lambda/subpixel conversion is covered by the in-memory test above)."""
    from keras.layers import Conv2D, Input
    from keras.models import Model

    from shadernn_tpu.tools import convert as convert_mod

    inputs = Input(shape=(12, 18, 1), name="input")
    x = Conv2D(8, 3, padding="same", activation="relu", name="c1")(inputs)
    x = Conv2D(4, 3, padding="same", activation="tanh", name="c2")(x)
    km = Model(inputs=inputs, outputs=x)
    h5 = tmp_path / "m.h5"
    km.save(str(h5))
    out = tmp_path / "m.json"
    convert_mod.main(["-f", str(h5), "-o", str(out)])
    assert out.exists()
    eng = Engine.from_json(str(out))
    x_in = rng.random((1, 12, 18, 1), dtype=np.float32)
    want = km.predict(x_in, verbose=0)
    got = np.asarray(eng.run_single(x_in))
    oracle.compare(got, want, fp32_threshold, "h5-cli-roundtrip")


def test_dump_layers_and_reader(tmp_path, rng):
    from shadernn_tpu.models import build_model
    from shadernn_tpu.tools.dump_reader import dump_layers, read_dump, to_png

    g = build_model("espcn", h=16, w=24)
    eng = Engine.from_graph(g, EngineOptions())
    paths = dump_layers(
        eng, {"input": rng.random((1, 16, 24, 1), dtype=np.float32)},
        str(tmp_path), raw_bin=True,
    )
    assert set(paths) == {n for n in g.nodes if g.nodes[n].op != "InputLayer"}
    arr = read_dump(paths["conv_1"])
    assert arr.shape == (1, 16, 24, 16)
    png = tmp_path / "c1.png"
    to_png(arr, str(png), channel=0)
    assert png.exists()


def test_compare_tool(tmp_path, rng):
    from shadernn_tpu.tools.compare import compare_arrays, main

    a = rng.random((8, 8), dtype=np.float32)
    np.save(tmp_path / "a.npy", a)
    np.save(tmp_path / "b.npy", a + 0.005)
    rc = main([str(tmp_path / "a.npy"), str(tmp_path / "b.npy"), "--threshold", "0.01"])
    assert rc == 0
    rc = main([str(tmp_path / "a.npy"), str(tmp_path / "b.npy"), "--threshold", "0.001"])
    assert rc == 1
    stats = compare_arrays(a, a)
    assert stats["max_abs_diff"] == 0.0 and stats["psnr_db"] == float("inf")
