"""Model conversion: Keras H5 / ONNX -> shadernn_tpu Graph + artifact.

Counterpart of the reference's convertTool (tools/convertTool/convertTool.py,
ModelConversion.md:19-33: `convertTool.py -f model.h5 [-d]` -> model JSON,
optionally decoupled into _layers.json + _weights.bin). Keras conv kernels
are already HWIO, matching our weight layout; BatchNormalization following
a conv is attached to it exactly as the reference's converter folds it
(conv2d.py layerinfo['batchNormalization']).

ONNX conversion is gated on the `onnx` package (not present in this image);
the importer raises with instructions rather than silently degrading.

CLI:  python -m shadernn_tpu.tools.convert -f model.h5 [-d] [-o out.json]
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional

import numpy as np

from shadernn_tpu.graph.builder import GraphBuilder
from shadernn_tpu.graph.ir import Graph, Node
from shadernn_tpu.utils import get_logger

logger = get_logger("snn_tpu.convert")

_ACT_MAP = {
    "linear": "linear", "relu": "relu", "relu6": "relu6", "tanh": "tanh",
    "sigmoid": "sigmoid", "softmax": "softmax", "swish": "silu",
    "silu": "silu", "leaky_relu": "leaky_relu", "gelu": "gelu",
}


def _keras_inbound(layer_conf: dict) -> List[str]:
    """Extract inbound layer names from a Keras (2 or 3) config entry."""
    nodes = layer_conf.get("inbound_nodes", [])
    names: List[str] = []

    def walk(obj):
        if isinstance(obj, dict):
            # Keras 3 symbolic tensor ref: {'class_name': '__keras_tensor__',
            # 'config': {'keras_history': [layer_name, node_idx, tensor_idx]}}
            hist = obj.get("config", {}).get("keras_history")
            if obj.get("class_name") == "__keras_tensor__" and hist:
                names.append(hist[0])
                return
            for v in obj.values():
                walk(v)
        elif isinstance(obj, (list, tuple)):
            # Keras 2 style: ['layer_name', node_idx, tensor_idx, {...}]
            if (
                len(obj) >= 3
                and isinstance(obj[0], str)
                and isinstance(obj[1], int)
                and isinstance(obj[2], int)
            ):
                names.append(obj[0])
                return
            for v in obj:
                walk(v)

    walk(nodes)
    # de-dup preserving order
    seen, out = set(), []
    for n in names:
        if n not in seen:
            seen.add(n)
            out.append(n)
    return out


def convert_keras(model, input_hw: Optional[tuple] = None) -> Graph:
    """Convert a loaded Keras model (functional or sequential) to a Graph.

    input_hw overrides dynamic (None) spatial dims — the reference's models
    are built with None H/W and a concrete size chosen at engine init
    (modelInference.cpp inputList)."""
    conf = model.get_config()
    layers_conf = conf["layers"]
    weights = {l.name: l.get_weights() for l in model.layers}
    types = {l.name: type(l).__name__ for l in model.layers}
    keras_layers = {l.name: l for l in model.layers}

    g = Graph(conf.get("name", "keras_model"))
    prev_name: Optional[str] = None  # sequential chaining fallback

    for lc in layers_conf:
        cls = lc["class_name"]
        c = lc.get("config", {})
        name = c.get("name", lc.get("name"))
        inbound = _keras_inbound(lc) or ([prev_name] if prev_name else [])
        inbound = [i for i in inbound if i in g.nodes]

        if cls == "InputLayer":
            shape = c.get("batch_shape", c.get("batch_input_shape"))
            h, w = shape[1], shape[2]
            ch = shape[3]
            if h is None or w is None:
                assert input_hw, "model has dynamic H/W; pass input_hw"
                h, w = input_hw
            g.add(Node(name, "InputLayer", [],
                       {"height": int(h), "width": int(w), "channels": int(ch)}))
        elif cls == "Conv2D":
            wts = weights[name]
            attrs = {
                "kernel_size": int(c["kernel_size"][0]),
                "stride": int(c["strides"][0]),
                "padding": c["padding"],
                "out_channels": int(c["filters"]),
                "use_bias": bool(c.get("use_bias", True)),
                "activation": _ACT_MAP.get(c.get("activation", "linear"), "linear"),
            }
            params = {"weight": np.asarray(wts[0], np.float32)}
            if attrs["use_bias"] and len(wts) > 1:
                params["bias"] = np.asarray(wts[1], np.float32)
            g.add(Node(name, "Conv2D", inbound, attrs, params))
        elif cls == "Conv2DTranspose":
            wts = weights[name]
            # Keras deconv kernel is (kh, kw, out, in) -> our HWIO (in, out)
            kern = np.asarray(wts[0], np.float32).transpose(0, 1, 3, 2)
            attrs = {
                "kernel_size": int(c["kernel_size"][0]),
                "stride": int(c["strides"][0]),
                "padding": c["padding"],
                "out_channels": int(c["filters"]),
                "use_bias": bool(c.get("use_bias", True)),
                "activation": _ACT_MAP.get(c.get("activation", "linear"), "linear"),
            }
            params = {"weight": kern}
            if attrs["use_bias"] and len(wts) > 1:
                params["bias"] = np.asarray(wts[1], np.float32)
            g.add(Node(name, "Conv2DTranspose", inbound, attrs, params))
        elif cls == "DepthwiseConv2D":
            wts = weights[name]
            kern = np.asarray(wts[0], np.float32)  # (kh, kw, C, mult)
            kh, kw, cin, mult = kern.shape
            kern = kern.reshape(kh, kw, 1, cin * mult)
            attrs = {
                "kernel_size": int(c["kernel_size"][0]),
                "stride": int(c["strides"][0]),
                "padding": c["padding"],
                "multiplier": int(c.get("depth_multiplier", 1)),
                "use_bias": bool(c.get("use_bias", True)),
                "activation": _ACT_MAP.get(c.get("activation", "linear"), "linear"),
            }
            params = {"weight": kern}
            if attrs["use_bias"] and len(wts) > 1:
                params["bias"] = np.asarray(wts[1], np.float32)
            g.add(Node(name, "SeparableConv2D", inbound, attrs, params))
        elif cls == "Dense":
            wts = weights[name]
            attrs = {
                "units": int(c["units"]),
                "use_bias": bool(c.get("use_bias", True)),
                "activation": _ACT_MAP.get(c.get("activation", "linear"), "linear"),
            }
            params = {"weight": np.asarray(wts[0], np.float32)}
            if attrs["use_bias"] and len(wts) > 1:
                params["bias"] = np.asarray(wts[1], np.float32)
            g.add(Node(name, "Dense", inbound, attrs, params))
        elif cls == "BatchNormalization":
            kl = keras_layers[name]
            g.add(Node(name, "BatchNormalization", inbound,
                       {"epsilon": float(c.get("epsilon", 1e-3))},
                       {"gamma": np.asarray(kl.gamma) if kl.gamma is not None else None,
                        "beta": np.asarray(kl.beta) if kl.beta is not None else None,
                        "mean": np.asarray(kl.moving_mean),
                        "variance": np.asarray(kl.moving_variance)}))
            node = g.nodes[name]
            c_dim = node.params["mean"].shape[0]
            if node.params["gamma"] is None:
                node.params["gamma"] = np.ones(c_dim, np.float32)
            if node.params["beta"] is None:
                node.params["beta"] = np.zeros(c_dim, np.float32)
        elif cls == "Activation":
            g.add(Node(name, "Activation", inbound,
                       {"activation": _ACT_MAP.get(c.get("activation"), "relu")}))
        elif cls in ("ReLU",):
            attrs = {"activation": "relu"}
            mx = c.get("max_value")
            if mx is not None and float(mx) == 6.0:
                attrs["activation"] = "relu6"
            g.add(Node(name, "Activation", inbound, attrs))
        elif cls == "LeakyReLU":
            g.add(Node(name, "Activation", inbound,
                       {"activation": "leaky_relu",
                        "leaky_alpha": float(c.get("negative_slope",
                                                   c.get("alpha", 0.3)))}))
        elif cls == "Add":
            g.add(Node(name, "Add", inbound, {}))
        elif cls == "Concatenate":
            g.add(Node(name, "Concatenate", inbound, {}))
        elif cls == "MaxPooling2D":
            g.add(Node(name, "MaxPooling2D", inbound,
                       {"kernel_size": int(c["pool_size"][0]),
                        "stride": int(c["strides"][0]),
                        "padding": c["padding"]}))
        elif cls == "AveragePooling2D":
            g.add(Node(name, "AveragePooling2D", inbound,
                       {"kernel_size": int(c["pool_size"][0]),
                        "stride": int(c["strides"][0]),
                        "padding": c["padding"]}))
        elif cls in ("GlobalAveragePooling2D",):
            g.add(Node(name, "AdaptiveAvgPool2d", inbound,
                       {"output_height": 1, "output_width": 1}))
            if not c.get("keepdims", False):
                g.add(Node(name + "_flat", "Flatten", [name], {}))
                prev_name = name + "_flat"
                continue
        elif cls == "UpSampling2D":
            interp = c.get("interpolation", "nearest")
            g.add(Node(name, "UpSampling2D", inbound,
                       {"scale": int(c["size"][0]), "interpolation": interp}))
        elif cls == "ZeroPadding2D":
            pad = c["padding"]  # ((t,b),(l,r))
            g.add(Node(name, "ZeroPadding2D", inbound,
                       {"pad_top": pad[0][0], "pad_bottom": pad[0][1],
                        "pad_left": pad[1][0], "pad_right": pad[1][1]}))
        elif cls == "Flatten":
            g.add(Node(name, "Flatten", inbound, {}))
        elif cls == "Lambda":
            # The reference's converter handles Lambda depth_to_space
            # (ESPCN subpixel) via custom-layer hooks
            # (userCustomLayers.py, docs Custom-Layer.md); we pattern-match
            # the common subpixel case.
            scale = _lambda_subpixel_scale(c, model, name)
            g.add(Node(name, "Subpixel", inbound, {"scale": scale}))
        elif cls in ("Dropout", "SpatialDropout2D"):
            # inference no-op: alias inbound
            prev_name = inbound[0] if inbound else prev_name
            continue
        else:
            raise ValueError(f"unsupported Keras layer {cls!r} ({name})")
        prev_name = name

    g.finalize()
    return g


def _lambda_subpixel_scale(conf: dict, model, name: str) -> int:
    """Infer the depth_to_space factor from a Lambda's I/O shapes."""
    try:
        layer = model.get_layer(name)
        in_shape = layer.input.shape
        out_shape = layer.output.shape
        if in_shape[1] and out_shape[1]:
            return int(out_shape[1] // in_shape[1])
        if in_shape[-1] and out_shape[-1]:
            return int(round((in_shape[-1] / out_shape[-1]) ** 0.5))
    except Exception:
        pass
    return 2


def convert_h5(path: str, input_hw: Optional[tuple] = None) -> Graph:
    import keras

    model = keras.models.load_model(path, compile=False, safe_mode=False)
    return convert_keras(model, input_hw=input_hw)


def convert_onnx(path: str) -> Graph:
    try:
        import onnx  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "ONNX conversion requires the `onnx` package, which is not "
            "installed in this environment. Convert via Keras H5, or export "
            "the ONNX graph to the ShaderNN JSON artifact with the upstream "
            "convertTool and load it with Engine.from_json."
        ) from e
    raise NotImplementedError("onnx importer pending (package unavailable)")


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Convert a model to a shadernn_tpu artifact "
        "(reference convertTool.py flag surface)"
    )
    ap.add_argument("-f", "--file", required=True, help="input .h5/.onnx")
    ap.add_argument("-d", "--decouple", action="store_true",
                    help="emit _layers.json + _weights.bin instead of monolithic JSON")
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--width", type=int, default=None)
    args = ap.parse_args(argv)

    input_hw = (args.height, args.width) if args.height else None
    ext = os.path.splitext(args.file)[1].lower()
    if ext == ".h5":
        graph = convert_h5(args.file, input_hw=input_hw)
    elif ext == ".onnx":
        graph = convert_onnx(args.file)
    else:
        raise SystemExit(f"unsupported input format {ext}")

    graph.infer_shapes()
    out = args.output or os.path.splitext(args.file)[0] + ".json"
    from shadernn_tpu.graph.serialize import save_model

    save_model(graph, out, decouple=args.decouple)
    logger.info("wrote %s (%d layers, %d params)", out, len(graph.nodes),
                graph.num_params)
    print(graph.summary())


if __name__ == "__main__":
    main()
