"""End-to-end train-step tests: single device and 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from r3m_tpu.models.distilbert import DistilBertConfig, distilbert_init
from r3m_tpu.models.r3m import R3MConfig
from r3m_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from r3m_tpu.training.trainer import (
    create_train_state,
    make_eval_step,
    make_train_step,
)

CFG = R3MConfig(
    size=18,
    hidden_dim=64,
    l2weight=1e-5,
    l1weight=1e-5,
    tcnweight=1.0,
    langweight=1.0,
    image_size=32,
)

BERT_SMALL = DistilBertConfig(
    vocab_size=100, dim=768, n_layers=1, n_heads=4, hidden_dim=128,
    max_position_embeddings=16,
)


def _fake_batch(rng, bs=8, t=12):
    return {
        "images": rng.uniform(0, 255, size=(bs, 5, 32, 32, 3)).astype(np.float32),
        "token_ids": rng.integers(0, 100, size=(bs, t)).astype(np.int32),
        "attn_mask": np.ones((bs, t), dtype=np.int32),
        "lang_mask": np.ones((bs,), dtype=np.float32),
    }


@pytest.fixture(scope="module")
def bert_params():
    # full-size hidden dim so lang_emb is 768-d as the reward head expects
    return distilbert_init(jax.random.PRNGKey(7), BERT_SMALL)


@pytest.mark.slow
def test_train_step_runs_and_learns(bert_params):
    rng = np.random.default_rng(0)
    state = create_train_state(CFG, jax.random.PRNGKey(0))
    step = make_train_step(CFG, bert_params=bert_params, donate=False)

    batch = _fake_batch(rng)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["full_loss"]))
    assert all(np.isfinite(losses))
    # same batch repeated => loss must go down
    assert losses[-1] < losses[0]
    assert int(state.step) == 5
    for k in ("l1loss", "l2loss", "l0loss", "tcnloss", "aligned",
              "rewloss", "rewacc1", "rewacc2", "rewacc3", "full_loss"):
        assert k in metrics


def test_eval_step_no_mutation(bert_params):
    rng = np.random.default_rng(1)
    state = create_train_state(CFG, jax.random.PRNGKey(0))
    evalf = make_eval_step(CFG, bert_params=bert_params)
    before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), state.params)
    m = evalf(state, _fake_batch(rng), jax.random.PRNGKey(3))
    assert np.isfinite(float(m["full_loss"]))
    after = state.params
    leaves_b = jax.tree_util.tree_leaves(before)
    leaves_a = jax.tree_util.tree_leaves(after)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), b)


@pytest.mark.slow
def test_multichip_dp_mesh(bert_params):
    """Full train step sharded over an 8-device CPU mesh."""
    assert len(jax.devices()) == 8, "conftest must force 8 host devices"
    mesh = make_mesh()
    rng = np.random.default_rng(2)

    state = create_train_state(CFG, jax.random.PRNGKey(0))
    state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())), state)
    step = make_train_step(CFG, bert_params=bert_params, mesh=mesh, donate=False)

    batch = shard_batch(mesh, _fake_batch(rng, bs=16))
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["full_loss"]))

    # global-batch semantics: sharded result == single-device result given
    # identical state/key (negatives span the global batch in both cases)
    step1 = make_train_step(CFG, bert_params=bert_params, donate=False)
    state1 = create_train_state(CFG, jax.random.PRNGKey(0))
    batch1 = _fake_batch(np.random.default_rng(2), bs=16)
    _, metrics1 = step1(state1, batch1)
    np.testing.assert_allclose(
        float(metrics["full_loss"]), float(metrics1["full_loss"]),
        rtol=2e-4,
    )


@pytest.mark.slow
def test_multislice_dcn_mesh(bert_params):
    """2-D (dcn, dp) multi-slice mesh: same global-batch loss as 1-chip."""
    mesh = make_mesh(8, n_slices=2)
    assert mesh.axis_names == ("dcn", "dp")
    assert mesh.devices.shape == (2, 4)
    rng = np.random.default_rng(3)

    state = create_train_state(CFG, jax.random.PRNGKey(0))
    state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())), state)
    step = make_train_step(CFG, bert_params=bert_params, mesh=mesh, donate=False)
    _, metrics = step(state, shard_batch(mesh, _fake_batch(rng, bs=16)))

    step1 = make_train_step(CFG, bert_params=bert_params, donate=False)
    state1 = create_train_state(CFG, jax.random.PRNGKey(0))
    _, metrics1 = step1(state1, _fake_batch(np.random.default_rng(3), bs=16))
    np.testing.assert_allclose(
        float(metrics["full_loss"]), float(metrics1["full_loss"]), rtol=2e-4
    )


@pytest.mark.slow
def test_bert_params_numpy_leaves(bert_params):
    """Snapshot loaders hand back numpy pytrees — the step must accept them
    (regression: numpy[tracer] embedding lookup failed at trace time)."""
    np_bert = jax.tree_util.tree_map(np.asarray, bert_params)
    state = create_train_state(CFG, jax.random.PRNGKey(0))
    step = make_train_step(CFG, bert_params=np_bert, donate=False)
    _, metrics = step(state, _fake_batch(np.random.default_rng(5), bs=4))
    assert np.isfinite(float(metrics["full_loss"]))


def test_place_bert_params_idempotent(bert_params):
    """One replicated BERT copy is shared by the train AND eval builders.

    The workspace places the frozen tree once; a second placement of an
    already-placed tree must return the SAME object (not a fresh ~265 MB
    replica per step builder — the regression this guards)."""
    from r3m_tpu.training.trainer import place_bert_params

    mesh = make_mesh()
    placed = place_bert_params(bert_params, mesh)
    assert place_bert_params(placed, mesh) is placed
    # and the step-builder path reuses it rather than re-placing
    from r3m_tpu.training.trainer import _check_bert

    assert _check_bert(CFG, placed, mesh=mesh) is placed


@pytest.mark.slow
def test_grad_accum_matches_manual_microbatch_average(bert_params):
    """grad_accum=2 must equal the hand-computed two-microbatch procedure:
    same per-microbatch keys/BN-stat threading, averaged gradients, one
    Adam update."""
    import optax

    from r3m_tpu.losses import draw_permutations
    from r3m_tpu.training.trainer import _encode_and_loss, make_optimizer

    rng = np.random.default_rng(2)
    batch = _fake_batch(rng, bs=8)
    state = create_train_state(CFG, jax.random.PRNGKey(4))
    step = make_train_step(
        CFG, bert_params=bert_params, donate=False, grad_accum=2
    )
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["full_loss"]))
    assert int(new_state.step) == 1

    # manual replication of the microbatch law
    key, _aug, _new = jax.random.split(state.key, 3)
    keys = jax.random.split(key, 2)
    stats = state.batch_stats
    gsum = None
    losses = []
    bert_dev = jax.tree_util.tree_map(jnp.asarray, bert_params)
    for i in range(2):
        mb = {k: jnp.asarray(v)[i * 4:(i + 1) * 4] for k, v in batch.items()}
        perms = draw_permutations(keys[i], 4, CFG.num_negatives)

        def loss_fn(params):
            loss, m, new_stats = _encode_and_loss(
                CFG, params, stats, bert_dev, mb, perms, True
            )
            return loss, (m, new_stats)

        (loss, (m, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        losses.append(float(m["full_loss"]))
        gsum = grads if gsum is None else jax.tree_util.tree_map(
            jnp.add, gsum, grads
        )
    grads = jax.tree_util.tree_map(lambda g: g / 2, gsum)
    tx = make_optimizer(CFG)
    updates, _ = tx.update(grads, state.opt_state, state.params)
    expect_params = optax.apply_updates(state.params, updates)

    np.testing.assert_allclose(
        float(metrics["full_loss"]), np.mean(losses), rtol=1e-5
    )
    # atol ~ 3*lr: Adam normalizes gradients, so compile-order float noise
    # on a near-zero gradient can flip one element's update by +-lr
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=1e-4
        ),
        new_state.params, expect_params,
    )
    # BN stats threaded through both microbatches
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        ),
        new_state.batch_stats, stats,
    )


def test_grad_accum_rejects_indivisible_batch(bert_params):
    state = create_train_state(CFG, jax.random.PRNGKey(0))
    step = make_train_step(
        CFG, bert_params=bert_params, donate=False, grad_accum=3
    )
    with pytest.raises(ValueError, match="grad_accum"):
        step(state, _fake_batch(np.random.default_rng(0), bs=8))


@pytest.mark.slow
def test_grad_accum_on_mesh_matches_single_device(bert_params):
    """grad_accum=2 under the 8-device dp mesh: the [B]->[A, B/A] reshape
    must stay a valid GSPMD program with single-device-identical results."""
    mesh = make_mesh()
    rng = np.random.default_rng(5)

    state = create_train_state(CFG, jax.random.PRNGKey(0))
    state_sh = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())), state)
    step = make_train_step(
        CFG, bert_params=bert_params, mesh=mesh, donate=False, grad_accum=2
    )
    batch = shard_batch(mesh, _fake_batch(rng, bs=16))
    state2, metrics = step(state_sh, batch)
    assert np.isfinite(float(metrics["full_loss"]))
    assert int(state2.step) == 1

    step1 = make_train_step(
        CFG, bert_params=bert_params, donate=False, grad_accum=2
    )
    _, metrics1 = step1(state, _fake_batch(np.random.default_rng(5), bs=16))
    np.testing.assert_allclose(
        float(metrics["full_loss"]), float(metrics1["full_loss"]), rtol=2e-4
    )


def test_multichip_hlo_collective_structure(bert_params):
    """Compiled-program guarantees for the dp mesh (SURVEY.md §5 comm row).

    The optimized SPMD module must (a) reduce gradients across chips
    (all-reduce — DataParallel's implicit grad sum), (b) exchange
    *embeddings* across chips so cross-video negatives span the global
    batch (trainer.py:87-92 semantics), and (c) never all-gather the raw
    image tensor — the conv stack, the FLOPs, stays batch-sharded.
    """
    mesh = make_mesh()
    rng = np.random.default_rng(3)
    state = create_train_state(CFG, jax.random.PRNGKey(0))
    state = replicate(mesh, state)
    step = make_train_step(CFG, bert_params=bert_params, mesh=mesh, donate=False)
    batch = shard_batch(mesh, _fake_batch(rng, bs=16))

    hlo = step.lower(state, batch).compile().as_text()

    assert "all-reduce" in hlo, "gradient reduction collective missing"
    assert any(
        c in hlo for c in ("all-gather", "all-to-all", "collective-permute")
    ), "no cross-chip exchange for global-batch negatives"
    # image tensors keep their [*, H, W, 3] trailing dims through the
    # (NHWC) encoder input; no collective may materialize one.
    for line in hlo.splitlines():
        if any(c in line for c in ("all-gather(", "all-gather-start(")):
            assert "32,32,3]" not in line.replace(" ", ""), (
                "raw images all-gathered across the mesh:\n" + line
            )


def test_multichip_collective_bytes_budget(bert_params):
    """Quantify the per-step inter-chip traffic the dp design implies
    (VERDICT round 2 item 5): gradient all-reduce ~= one f32 copy of the
    trainable params, embedding exchange orders of magnitude below the
    conv activation traffic. The byte totals printed here back the ICI/DCN
    time budget in docs/DESIGN.md.
    """
    from r3m_tpu.parallel.mesh import collective_cost_report

    mesh = make_mesh()
    state = create_train_state(CFG, jax.random.PRNGKey(0))
    state8 = replicate(mesh, state)
    step = make_train_step(CFG, bert_params=bert_params, mesh=mesh, donate=False)
    batch = shard_batch(mesh, _fake_batch(np.random.default_rng(3), bs=16))

    hlo = step.lower(state8, batch).compile().as_text()
    report = collective_cost_report(hlo)
    print("collective bytes/step (8-device dp, bs=16, 32px):", report)

    param_bytes = sum(
        int(np.prod(np.shape(x))) * 4
        for x in jax.tree_util.tree_leaves(state.params)
    )
    ar = report["bytes"].get("all-reduce", 0)
    # grad reduction must move every trainable param (f32) at least once
    # and not blow up into activation-scale traffic (bucketing/fusion may
    # add metric scalars + a second pass for stats, hence the 3x headroom)
    assert ar >= param_bytes, (ar, param_bytes)
    assert ar < 3 * param_bytes, (ar, param_bytes)

    # the global-batch negative exchange moves embedding-scale buffers
    # ([B*5, out_dim] + loss intermediates), far below conv activations
    exchange = sum(
        report["bytes"].get(k, 0)
        for k in ("all-gather", "all-to-all", "collective-permute")
    )
    image_bytes = 16 * 5 * 32 * 32 * 3 * 4
    assert 0 < exchange < 64 * image_bytes, (exchange, image_bytes)


@pytest.mark.slow
def test_lr_schedule_string(bert_params):
    """cfg.lr as a schedule string drives per-step Adam learning rates."""
    import dataclasses

    from r3m_tpu.utils.misc import schedule, schedule_fn

    # jit-traceable schedule matches the reference-grammar parser
    for s in ("0.003", "linear(1.0,0.0,10)", "step_linear(1.0,0.5,10,0.0,10)"):
        for step in (0, 5, 10, 15, 25):
            np.testing.assert_allclose(
                float(jax.jit(schedule_fn(s))(jnp.asarray(step, jnp.float32))),
                schedule(s, step),
                rtol=1e-6,
            )

    # lr hits 0 after `duration` steps: the second update is a no-op
    cfg = dataclasses.replace(CFG, lr="linear(0.01,0.0,1)", langweight=0.0)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, donate=False)
    batch = _fake_batch(np.random.default_rng(0), bs=4)
    s1, _ = step(state, batch)
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, s1.params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    s2, _ = step(s1, batch)
    moved2 = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s2.params
    )
    assert max(jax.tree_util.tree_leaves(moved2)) == 0.0


@pytest.mark.slow
def test_multichip_flops_scale_down_per_device(bert_params):
    """Weak-scaling evidence: the SPMD-partitioned step's per-device FLOPs
    are ~1/8 of the single-device program at the same GLOBAL batch — the
    conv work really is divided, not replicated, across the dp mesh."""
    mesh = make_mesh()
    rng = np.random.default_rng(7)
    state = create_train_state(CFG, jax.random.PRNGKey(0))
    batch1 = _fake_batch(rng, bs=16)

    step1 = make_train_step(CFG, bert_params=bert_params, donate=False)
    flops1 = step1.lower(state, batch1).compile().cost_analysis()["flops"]

    state8 = replicate(mesh, state)
    step8 = make_train_step(CFG, bert_params=bert_params, mesh=mesh, donate=False)
    batch8 = shard_batch(mesh, _fake_batch(np.random.default_rng(7), bs=16))
    flops8 = step8.lower(state8, batch8).compile().cost_analysis()["flops"]

    assert flops1 > 0 and flops8 > 0
    ratio = flops8 / flops1
    # per-device cost: 1/8 of the compute plus collective/negative-exchange
    # overhead; anywhere near 1.0 would mean replicated (not sharded) work
    assert ratio < 0.35, f"per-device flops ratio {ratio:.3f}"


@pytest.mark.slow
def test_lars_optimizer_option():
    """optimizer='lars' trains (large-batch scale-out path); typos raise."""
    import dataclasses

    cfg = dataclasses.replace(CFG, langweight=0.0, optimizer="lars", lr=0.1)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    # LARS computes its trust ratio per parameter array, so the packed-BN
    # concatenation would change the update math — packing must stay off
    # for lars even at the packed_bn=True default
    from r3m_tpu.models.resnet import is_packed

    assert cfg.packed_bn and not is_packed(state.params["convnet"])
    step = make_train_step(cfg, donate=False)
    batch = _fake_batch(np.random.default_rng(0), bs=4)
    s1, m1 = step(state, batch)
    assert np.isfinite(float(m1["full_loss"]))
    moved = max(
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(
                lambda a, b: float(jnp.max(jnp.abs(a - b))),
                state.params, s1.params,
            )
        )
    )
    assert moved > 0

    with pytest.raises(ValueError, match="optimizer"):
        make_train_step(
            dataclasses.replace(CFG, langweight=0.0, optimizer="lamb")
        )


def test_make_mesh_rejects_oversubscription():
    with pytest.raises(ValueError, match="n_devices"):
        make_mesh(len(jax.devices()) + 1)


@pytest.mark.slow
def test_no_per_step_transfers_on_mesh(bert_params):
    """Steady-state sharded steps must not re-place ANY argument — a
    mis-sharded closure/arg (e.g. single-device BERT weights vs the
    declared replicated sharding) would silently re-broadcast ~265 MB
    every step."""
    mesh = make_mesh()
    np_bert = jax.tree_util.tree_map(np.asarray, bert_params)  # numpy, as loaders return
    state = replicate(mesh, create_train_state(CFG, jax.random.PRNGKey(0)))
    step = make_train_step(CFG, bert_params=np_bert, mesh=mesh, donate=False)
    batch = shard_batch(mesh, _fake_batch(np.random.default_rng(0), bs=16))
    state, _ = step(state, batch)  # compile + first placement
    batch2 = shard_batch(mesh, _fake_batch(np.random.default_rng(1), bs=16))
    with jax.transfer_guard("disallow"):
        state, metrics = step(state, batch2)
    assert np.isfinite(float(jax.device_get(metrics["full_loss"])))


def test_place_host_batch_multihost_branch(bert_params):
    """Single-process exercise of the multi-host placement path
    (workspace._place -> place_host_batch(multihost=True)): with one
    process the local slice IS the global batch, so
    make_array_from_process_local_data must produce arrays identical in
    shape, sharding, and value to the single-host device_put path."""
    from r3m_tpu.parallel.mesh import batch_sharded, place_host_batch

    mesh = make_mesh()
    batch = _fake_batch(np.random.default_rng(0), bs=16)
    single = place_host_batch(mesh, batch, multihost=False)
    multi = place_host_batch(mesh, batch, multihost=True)
    sh = batch_sharded(mesh)
    for k in batch:
        assert multi[k].shape == single[k].shape == batch[k].shape
        assert multi[k].sharding == sh
        np.testing.assert_array_equal(
            np.asarray(multi[k]), np.asarray(single[k])
        )
    # and the placed batch actually drives a sharded train step
    state = replicate(mesh, create_train_state(CFG, jax.random.PRNGKey(0)))
    step = make_train_step(CFG, bert_params=bert_params, mesh=mesh, donate=False)
    _, metrics = step(state, multi)
    assert np.isfinite(float(jax.device_get(metrics["full_loss"])))


def test_place_host_batch_no_mesh():
    from r3m_tpu.parallel.mesh import place_host_batch

    batch = {"clips": np.ones((2, 5, 8, 8, 3), np.uint8)}
    placed = place_host_batch(None, batch)
    assert isinstance(placed["clips"], jax.Array)
    assert placed["clips"].shape == batch["clips"].shape


def test_collective_report_parses_variadic_tuples():
    """XLA's all-gather combiner emits variadic -start ops whose result type
    is a NESTED tuple; a naive first-')' parse counted one aliased input
    buffer instead of all gathered outputs (review finding)."""
    from r3m_tpu.parallel.mesh import collective_cost_report

    hlo = "\n".join([
        "  %ag = ((f32[128], f32[256]), (f32[1024], f32[2048]))"
        " all-gather-start(...)",
        "  %agd = ((f32[128], f32[256]), (f32[1024], f32[2048]))"
        " all-gather-done(...)",
        "  %ar = (f32[512], bf16[64]) all-reduce(...)",
        "  %cp = (f32[64], f32[64], u32[], u32[]) collective-permute-start(...)",
    ])
    r = collective_cost_report(hlo)
    # outputs only (second tuple element), not the aliased inputs; -done skipped
    assert r["bytes"]["all-gather"] == (1024 + 2048) * 4
    assert r["ops"]["all-gather"] == 1
    # variadic all-reduce sums every element
    assert r["bytes"]["all-reduce"] == 512 * 4 + 64 * 2
    # collective-permute-start: output + two u32 context scalars
    assert r["bytes"]["collective-permute"] == 64 * 4 + 8


@pytest.mark.slow
def test_vit_fused_kernel_survives_mesh(bert_params):
    """Round-5 (VERDICT item 2): "auto" keeps the ViT fused-attention
    kernel under the dp mesh instead of silently reverting to einsum.

    vit_b32_apply shard_map-wraps the pallas call over the mesh's batch
    axes — attention is per-sample, so (a) the numerics must match the
    einsum path and (b) the compiled program's collective traffic must be
    identical (the wrap adds zero collectives). Reference capability being
    scaled: the ViT backbone, models_r3m.py:52-56, under DataParallel
    semantics (train_representation.py:29-31).
    """
    import dataclasses

    from r3m_tpu.parallel.mesh import collective_cost_report

    mesh = make_mesh()
    vit_auto = dataclasses.replace(CFG, size=0)  # "auto" -> batched kernel
    vit_einsum = dataclasses.replace(CFG, size=0, vit_fused_attn=False)
    rng = np.random.default_rng(5)
    batch = shard_batch(mesh, _fake_batch(rng, bs=16))

    reports = {}
    losses = {}
    for name, cfg in (("kernel", vit_auto), ("einsum", vit_einsum)):
        state = replicate(mesh, create_train_state(cfg, jax.random.PRNGKey(0)))
        step = make_train_step(
            cfg, bert_params=bert_params, mesh=mesh, donate=False
        )
        lowered = step.lower(state, batch)
        reports[name] = collective_cost_report(lowered.compile().as_text())
        _, metrics = step(state, batch)
        losses[name] = float(metrics["full_loss"])
        # shard_map lowers to a Shardy manual-computation region in the
        # STABLEHLO (the optimized CPU HLO inlines it away; interpret mode
        # emits no tpu_custom_call — the -m tpu tier covers Mosaic). The
        # einsum program must NOT contain one.
        has_manual = "sdy.manual_computation" in lowered.as_text()
        assert has_manual == (name == "kernel"), (name, has_manual)

    # (a) per-sample math: identical loss up to f32 reassociation
    np.testing.assert_allclose(losses["kernel"], losses["einsum"], rtol=2e-4)
    # (b) zero added collectives: byte-for-byte identical traffic
    assert reports["kernel"]["bytes"] == reports["einsum"]["bytes"], (
        reports["kernel"], reports["einsum"],
    )


def test_vit_auto_indivisible_batch_falls_back_to_einsum(bert_params):
    """shard_map needs the flat frame batch divisible by the device count;
    "auto" must DEGRADE to the einsum path there (which GSPMD partitions
    fine unevenly), not fail at trace time — a review finding. A
    non-divisible GLOBAL batch already fails at placement (device_put
    enforces even sharding), so the real exposure is grad_accum
    microbatches: bs=8, accum=2 -> 20-frame micro flat batch, 20 % 8 != 0
    on the 8-device mesh."""
    import dataclasses

    mesh = make_mesh()
    cfg = dataclasses.replace(CFG, size=0)  # "auto"
    state = replicate(mesh, create_train_state(cfg, jax.random.PRNGKey(0)))
    step = make_train_step(
        cfg, bert_params=bert_params, mesh=mesh, donate=False, grad_accum=2
    )
    batch = shard_batch(mesh, _fake_batch(np.random.default_rng(2), bs=8))
    lowered = step.lower(state, batch)
    # fell back: no shard_map manual-computation region in the program
    assert "sdy.manual_computation" not in lowered.as_text()
    _, metrics = step(state, batch)
    assert np.isfinite(float(metrics["full_loss"]))


def test_vit_explicit_kernel_indivisible_batch_raises(bert_params):
    """An EXPLICIT vit_fused_attn='batched' on an indivisible micro batch
    must error clearly instead of silently betraying the setting."""
    import dataclasses

    mesh = make_mesh()
    cfg = dataclasses.replace(CFG, size=0, vit_fused_attn="batched")
    state = replicate(mesh, create_train_state(cfg, jax.random.PRNGKey(0)))
    step = make_train_step(
        cfg, bert_params=bert_params, mesh=mesh, donate=False, grad_accum=2
    )
    batch = shard_batch(mesh, _fake_batch(np.random.default_rng(2), bs=8))
    with pytest.raises(ValueError, match="divisible"):
        step.lower(state, batch)
