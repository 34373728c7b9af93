"""Round-trip test for the TF1 checkpoint importer.

Mechanics under test: TF1 Saver bundle reading, optimizer-slot dropping,
G/D partitioning, role classification, (role, shape, order) alignment,
--map pinning, loud failure on unmatched leaves, and the orbax step-0
checkpoint the existing CLIs consume. The reference's exact variable names
are unverifiable (empty mount), so the fixture checkpoint uses tflib-style
suffixes with names whose natural order mirrors network order — the
documented contract of the matcher.
"""

import json
import os
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import import_tf1_checkpoint as imp  # noqa: E402

_SUFFIX = {"kernel": "W", "bias": "b", "scale": "gamma", "bn_bias": "beta",
           "mean": "moving_mean", "var": "moving_variance", "u": "u",
           "embedding": "embed"}


def _source_values(seed_g=100, seed_d=101):
    """Distinct-from-fresh-init variable trees for a tiny acgan G/D."""
    import types

    import jax

    args = types.SimpleNamespace(model="acgan", num_classes=0, width_mul=1.0,
                                 resolution=32, image_size=32, ngf=8, ndf=8)
    g, d, g_init, d_init = imp.build_models(args)
    return g_init(jax.random.PRNGKey(seed_g)), d_init(jax.random.PRNGKey(seed_d))


def _to_tf_names(variables, prefix):
    leaves = sorted(imp.flatten_variables(variables), key=lambda t: imp._natkey(t[0]))
    out = []
    for i, (path, keys, val, role) in enumerate(leaves):
        out.append((f"{prefix}.{i:02d}.{_SUFFIX[role]}", path, val))
    return out


def _write_tf1_ckpt(tmp_path, named, extra=()):
    tf1 = tf.compat.v1
    graph = tf.Graph()
    with graph.as_default():
        for name, _, val in named:
            tf1.get_variable(name, initializer=tf.constant(np.asarray(val)))
        for name, val in extra:
            tf1.get_variable(name, initializer=tf.constant(np.asarray(val)))
        saver = tf1.train.Saver()
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            return saver.save(sess, os.path.join(str(tmp_path), "model.ckpt"))


@pytest.fixture(scope="module")
def fixture_ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tf1")
    gv, dv = _source_values()
    named = _to_tf_names(gv, "Generator") + _to_tf_names(dv, "Discriminator")
    # optimizer slots and bookkeeping the importer must drop
    extra = [("beta1_power", np.float32(0.9)),
             ("Generator.00.W/Adam", np.zeros(named[0][2].shape, np.float32)),
             ("global_step", np.int64(100000))]
    prefix = _write_tf1_ckpt(tmp, named, extra)
    return prefix, gv, dv, named


def test_round_trip_import(fixture_ckpt, tmp_path):
    import jax.tree_util as jtu

    prefix, gv, dv, _ = fixture_ckpt
    out = str(tmp_path / "imported")
    rc = imp.main(["--ckpt", prefix, "--model", "acgan", "--out-dir", out])
    assert rc == 0

    report = json.load(open(os.path.join(out, "import_report.json")))
    assert not report["generator"]["unmatched_target"]
    assert not report["discriminator"]["unmatched_target"]
    # dropped slots never appear anywhere in the report
    flat = json.dumps(report)
    assert "Adam" not in flat and "beta1_power" not in flat

    from gan_lib_tensorflow_tpu.train import CheckpointManager
    raw = CheckpointManager(os.path.join(out, "ckpt")).restore_latest_raw()
    for tree_key, src in (("g_params", gv["params"]),
                          ("d_params", dv["params"])):
        got, exp = jtu.tree_leaves(raw[tree_key]), jtu.tree_leaves(src)
        assert len(got) == len(exp)
        for a, b in zip(got, exp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                                       atol=0)
    # EMA seeded with the imported (trained) generator weights
    for a, b in zip(jtu.tree_leaves(raw["ema_params"]),
                    jtu.tree_leaves(gv["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # G batch_stats travelled through the g_state collection
    stats = raw["g_state"]["batch_stats"]
    for a, b in zip(jtu.tree_leaves(stats), jtu.tree_leaves(gv["batch_stats"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_report_only_and_partial_failure(fixture_ckpt, tmp_path):
    prefix, gv, dv, named = fixture_ckpt
    # report-only: exits 0, writes no checkpoint
    out = str(tmp_path / "report")
    assert imp.main(["--ckpt", prefix, "--model", "acgan", "--out-dir", out,
                     "--report-only"]) == 0
    assert os.path.exists(os.path.join(out, "import_report.json"))
    assert not os.path.exists(os.path.join(out, "ckpt"))

    # remove one generator variable -> unmatched target leaf -> loud failure
    partial = [nv for nv in named if nv[0] != named[0][0]]
    prefix2 = _write_tf1_ckpt(tmp_path / "partial", partial)
    out2 = str(tmp_path / "imported2")
    with pytest.raises(SystemExit, match="no source variable"):
        imp.main(["--ckpt", prefix2, "--model", "acgan", "--out-dir", out2])
    # --allow-partial keeps the fresh init for that leaf and succeeds
    assert imp.main(["--ckpt", prefix2, "--model", "acgan", "--out-dir", out2,
                     "--allow-partial"]) == 0


def test_sngan_sn_u_vectors_match():
    """The sngan D carries a spectral-norm 'sn' collection of u-vectors —
    a role the acgan fixture doesn't exercise. Matcher-level check that u
    leaves classify and align (no checkpoint I/O needed)."""
    import jax

    from gan_lib_tensorflow_tpu.models import sngan

    d = sngan.cifar_discriminator()
    dv = d.init(jax.random.PRNGKey(1), np.zeros((2, 32, 32, 3), np.float32))
    leaves = imp.flatten_variables(dv)
    u_leaves = [p for p, k, v, role in leaves if role == "u"]
    assert u_leaves and all(p.startswith("sn/") for p in u_leaves)

    named = _to_tf_names(dv, "Discriminator")
    tf_vars = {name: np.asarray(val) for name, _, val in named}
    assignments, report = imp.match(tf_vars, leaves, {}, "D")
    assert not report["unmatched_target"] and not report["unmatched_tf"]
    # every u landed on a u (same values by construction)
    by_path = {p: v for p, k, v, r in leaves}
    for name, path, val in named:
        if name.endswith(".u"):
            keys = next(k for p, k, v, r in leaves if p == path)
            np.testing.assert_array_equal(assignments[keys], np.asarray(val))


def test_nchw_boundary_permutation_exact():
    """The G input dense's output columns must reorder from (C,H,W) to
    (H,W,C) flattening. Encode each column's (c,h,w) index in its value and
    assert the permuted kernel reads out in (h,w,c) order."""
    C, H, W = 3, 4, 4
    dim = C * H * W
    # column j holds the TF (NCHW) coordinate it feeds: j = c*H*W + h*W + w
    kernel = np.tile(np.arange(dim, dtype=np.float32), (5, 1))  # [in=5, out]
    bias = np.arange(dim, dtype=np.float32)
    g_vars = {"params": {"dense": {"kernel": kernel, "bias": bias}}}
    fixed, _ = imp.nchw_boundary_fixups(g_vars, {"params": {}}, "sngan")
    got = np.asarray(fixed["params"]["dense"]["kernel"])[0]
    got_b = np.asarray(fixed["params"]["dense"]["bias"])
    # new column at NHWC position (h,w,c) must be the TF var for (c,h,w)
    for h in range(H):
        for w in range(W):
            for c in range(C):
                nhwc = (h * W + w) * C + c
                assert got[nhwc] == c * H * W + h * W + w
                assert got_b[nhwc] == c * H * W + h * W + w


def test_explicit_map_pins_a_variable(fixture_ckpt, tmp_path):
    import jax.tree_util as jtu

    prefix, gv, dv, named = fixture_ckpt
    # pin the first generator leaf explicitly; the rest match automatically
    first = sorted(imp.flatten_variables(gv), key=lambda t: imp._natkey(t[0]))[0]
    mapping = {named[0][0]: first[0]}
    map_path = tmp_path / "map.json"
    map_path.write_text(json.dumps(mapping))
    out = str(tmp_path / "imported")
    assert imp.main(["--ckpt", prefix, "--model", "acgan", "--out-dir", out,
                     "--map", str(map_path)]) == 0
    report = json.load(open(os.path.join(out, "import_report.json")))
    hows = {m["tf"]: m["how"] for m in report["generator"]["matched"]}
    assert hows[named[0][0]] == "explicit"


def test_typod_map_key_fails_loudly(fixture_ckpt, tmp_path):
    """A --map pin whose TF name exists in NEITHER network must abort: a typo
    would otherwise silently fall back to the heuristic alignment the pin was
    meant to override (ADVICE r3)."""
    prefix, gv, dv, named = fixture_ckpt
    first = sorted(imp.flatten_variables(gv), key=lambda t: imp._natkey(t[0]))[0]
    map_path = tmp_path / "map.json"
    map_path.write_text(json.dumps({"Generator.99.W_typo": first[0]}))
    with pytest.raises(SystemExit, match="not in the checkpoint"):
        imp.main(["--ckpt", prefix, "--model", "acgan",
                  "--out-dir", str(tmp_path / "imported"),
                  "--map", str(map_path)])
