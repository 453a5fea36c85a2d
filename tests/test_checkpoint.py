"""Orbax + npz checkpoint roundtrips, including sharded restore."""

import os

import jax
import numpy as np
import pytest

from openhush_tpu.models.whisper import model as whisper
from openhush_tpu.models.whisper.config import get_config
from openhush_tpu.utils import checkpoint as ck


@pytest.fixture(scope="module")
def params():
    return whisper.init_params(get_config("test"), jax.random.PRNGKey(0))


def test_orbax_roundtrip(tmp_path, params):
    p = str(tmp_path / "ckpt")
    ck.save_orbax(params, p)
    loaded = ck.load_params(p)
    np.testing.assert_array_equal(
        np.asarray(params["decoder"]["tok_emb"]),
        np.asarray(loaded["decoder"]["tok_emb"]))


def test_train_state_roundtrip(tmp_path, params):
    from openhush_tpu.training import train
    opt = train.make_optimizer()
    opt_state = opt.init(params)
    p = str(tmp_path / "ts")
    ck.save_train_state(p, params, opt_state, 42)
    p2, o2, step = ck.load_train_state(p)
    assert step == 42
    np.testing.assert_array_equal(
        np.asarray(params["encoder"]["conv1_b"]),
        np.asarray(p2["encoder"]["conv1_b"]))


def test_sharded_restore(tmp_path, params):
    """Restore directly onto a (data, model) mesh."""
    from openhush_tpu.parallel import sharding as sh
    from jax.sharding import NamedSharding
    mesh = sh.create_mesh(n_model=2)
    specs = sh.param_spec(params)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
    p = str(tmp_path / "sharded")
    ck.save_orbax(params, p)
    restored = ck.load_orbax(p, template=params, shardings=shardings)
    leaf = restored["encoder"]["layers"]["q_w"]
    assert not leaf.sharding.is_fully_replicated
    np.testing.assert_allclose(
        np.asarray(leaf), np.asarray(params["encoder"]["layers"]["q_w"]))


def test_load_params_npz(tmp_path, params):
    from openhush_tpu.models.whisper.convert import save_npz
    p = str(tmp_path / "m.npz")
    save_npz(params, p)
    loaded = ck.load_params(p)
    np.testing.assert_array_equal(
        np.asarray(params["decoder"]["pos_emb"]),
        np.asarray(loaded["decoder"]["pos_emb"]))
