"""Multi-device SPMD tests on the virtual 8-device CPU mesh.

The "fake backend" tier the reference never had (SURVEY.md §4): DP/TP/SP
shardings must compile and produce results identical to single-device
execution (GSPMD halo exchange for spatially-sharded convs included).
"""

import numpy as np
import pytest
import jax

import oracle
from shadernn_tpu.config import EngineOptions, Precision, ShardingOptions
from shadernn_tpu.engine.compile import compile_graph
from shadernn_tpu.engine.engine import Engine
from shadernn_tpu.models import build_model
from shadernn_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _espcn_ref(x):
    g = build_model("espcn", h=x.shape[1], w=x.shape[2])
    model = compile_graph(g, EngineOptions(batch_size=x.shape[0]))
    return np.asarray(model.run_single(x))


@pytest.mark.parametrize("data,model_p,spatial", [
    (8, 1, 1),   # pure DP
    (1, 8, 1),   # pure TP (channel sharding)
    (1, 1, 8),   # pure SP (spatial + halo exchange)
    (2, 2, 2),   # mixed
])
def test_espcn_sharded_matches_single_device(rng, data, model_p, spatial):
    batch = max(data, 1) * 2
    h = 8 * max(spatial, 1)
    x = rng.random((batch, h, 32, 1), dtype=np.float32)

    want = _espcn_ref(x)

    sh = ShardingOptions(data=data, model=model_p, spatial=spatial)
    mesh = make_mesh(sh)
    g = build_model("espcn", h=h, w=32)
    eng = Engine.from_graph(
        g, EngineOptions(batch_size=batch, sharding=sh), mesh=mesh
    )
    got = np.asarray(eng.run_single(x))
    oracle.compare(got, want, 1e-4, f"sharded d{data}m{model_p}s{spatial}")


def test_resnet_sharded(rng):
    """Classifier with BN-folded convs + dense head under mixed sharding."""
    sh = ShardingOptions(data=2, model=4, spatial=1)
    mesh = make_mesh(sh)
    x = rng.random((4, 32, 32, 3), dtype=np.float32)

    g1 = build_model("resnet18")
    single = Engine.from_graph(g1, EngineOptions(batch_size=4))
    want = np.asarray(single.run_single(x))

    g2 = build_model("resnet18")
    eng = Engine.from_graph(g2, EngineOptions(batch_size=4, sharding=sh), mesh=mesh)
    got = np.asarray(eng.run_single(x))
    oracle.compare(got, want, 1e-4, "resnet-sharded")


def test_mesh_validation():
    with pytest.raises(ValueError):
        make_mesh(ShardingOptions(data=64, model=1, spatial=1))
