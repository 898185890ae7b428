"""Compact-vocab exactness and MLM pretraining behavior."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eeg_multimodal_tpu.data import datasets as D
from eeg_multimodal_tpu.data.compact_vocab import (
    CompactVocab,
    build_compact_vocab,
    remap_pairing,
    MASK_ID,
    PAD_ID,
    UNK_ID,
)
from eeg_multimodal_tpu.models import bert as bert_mod
from eeg_multimodal_tpu.train import mlm


def toy_ids(key, n=16, s=24, vocab=200):
    ids = np.array(jax.random.randint(key, (n, s), 104, vocab))
    ids[:, 0] = 101
    lens = np.asarray(jax.random.randint(jax.random.fold_in(key, 1), (n,), 6, s))
    mask = np.zeros((n, s), np.int32)
    for i, L in enumerate(lens):
        ids[i, L - 1] = 102
        ids[i, L:] = PAD_ID
        mask[i, :L] = 1
    return ids.astype(np.int32), mask


class TestCompactVocab:
    def test_roundtrip_and_specials(self):
        ids, mask = toy_ids(jax.random.PRNGKey(0))
        cv = build_compact_vocab([ids])
        assert cv.size <= 200
        # specials always present
        for sid in (PAD_ID, UNK_ID, 101, 102, MASK_ID):
            cv.compact_id(sid)
        assert cv.pad_id == 0  # sorted ascending keeps PAD at 0
        new = cv.remap(ids)
        assert new.max() < cv.size
        assert np.array_equal(cv.unmap(new), ids)

    def test_gather_equality(self):
        """compact_table[remap(ids)] == full_table[ids] bitwise."""
        ids, _ = toy_ids(jax.random.PRNGKey(1))
        cv = build_compact_vocab([ids], full_vocab=512)
        full = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (512, 8)))
        compact = cv.compact_embeddings(full)
        assert compact.shape == (cv.size, 8)
        assert np.array_equal(compact[cv.remap(ids)], full[ids])

    def test_expand_inverse(self):
        ids, _ = toy_ids(jax.random.PRNGKey(3))
        cv = build_compact_vocab([ids], full_vocab=512)
        compact = np.random.default_rng(0).normal(size=(cv.size, 4)).astype(np.float32)
        full = cv.expand_embeddings(compact)
        assert full.shape == (512, 4)
        assert np.array_equal(cv.compact_embeddings(full), compact)
        # unused rows are fill
        unused = np.setdiff1d(np.arange(512), cv.new_to_old)
        assert np.all(full[unused] == 0.0)

    def test_unknown_id_maps_to_unk(self):
        cv = CompactVocab.from_ids(np.asarray([200, 201]), full_vocab=300)
        out = cv.remap(np.asarray([200, 250]))
        assert out[0] == cv.compact_id(200)
        assert out[1] == cv.compact_id(UNK_ID)

    def test_remap_pairing_only_txt_streams(self):
        ids, mask = toy_ids(jax.random.PRNGKey(4))
        emb = np.random.default_rng(1).normal(size=(16, 512)).astype(np.float32)
        arrays = D.build_pairing(
            "ti", np.zeros(16, np.int32),
            eeg_txt={"input_ids": ids, "attention_mask": mask}, act_img=emb,
        )
        cv = build_compact_vocab([ids])
        out = remap_pairing(arrays, cv)
        assert np.array_equal(cv.unmap(out.eeg_input), arrays.eeg_input)
        assert np.array_equal(out.act_input, arrays.act_input)

    def test_save_load(self, tmp_path):
        ids, _ = toy_ids(jax.random.PRNGKey(5))
        cv = build_compact_vocab([ids])
        path = str(tmp_path / "cv.npz")
        cv.save(path)
        cv2 = CompactVocab.load(path)
        assert np.array_equal(cv2.new_to_old, cv.new_to_old)
        assert cv2.full_vocab == cv.full_vocab


TINY = bert_mod.BertConfig(
    vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
    intermediate_size=64, max_position_embeddings=32,
)


class TestMLM:
    def test_mask_statistics(self):
        cfg = mlm.MLMConfig(mask_id=5, cls_id=1, sep_id=2, pad_id=0)
        key = jax.random.PRNGKey(0)
        ids = jnp.full((64, 32), 10, jnp.int32).at[:, 0].set(1).at[:, -4].set(2)
        mask = jnp.ones((64, 32), jnp.int32).at[:, -3:].set(0)
        corrupted, labels, selected = mlm.mask_tokens(key, ids, mask, cfg, 64)
        sel = np.asarray(selected)
        # specials and padding never selected
        assert not sel[:, 0].any() and not sel[:, -4:].any()
        frac = sel[:, 1:-4].mean()
        assert 0.10 < frac < 0.20
        # ~80% of selected become [MASK]
        m = np.asarray(corrupted)[sel] == 5
        assert 0.65 < m.mean() < 0.95
        # labels are the original ids
        assert np.array_equal(np.asarray(labels), np.asarray(ids))

    def test_loss_decreases(self):
        ids, mask = toy_ids(jax.random.PRNGKey(7), n=32, s=16, vocab=60)
        # re-range ids into the tiny vocab: use compact remap
        cv = build_compact_vocab([ids], full_vocab=512)
        cids = cv.remap(ids)
        cfg = mlm.MLMConfig(
            batch_size=16, total_steps=60, warmup_steps=5, log_every=30,
            learning_rate=3e-3, mask_id=cv.mask_id, cls_id=cv.cls_id,
            sep_id=cv.sep_id, pad_id=cv.pad_id,
        )
        tiny = bert_mod.BertConfig(
            vocab_size=cv.size, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_position_embeddings=16,
        )
        trainer = mlm.MLMPretrainer(tiny, cfg)
        _, history = trainer.fit(cids, mask[:, :16], echo=False)
        assert history[-1]["loss"] < history[0]["loss"]
        assert np.isfinite(trainer.eval_loss(cids, mask[:, :16], n_batches=2))

    def test_build_corpus_truncates(self):
        ids, mask = toy_ids(jax.random.PRNGKey(8), n=8, s=40)
        c_ids, c_mask = mlm.build_corpus(
            [{"input_ids": ids, "attention_mask": mask}] * 2, multiple=16
        )
        assert c_ids.shape[0] == 16
        longest = int(mask.sum(1).max())
        assert c_ids.shape[1] == min(-(-longest // 16) * 16, ids.shape[1])
        assert (c_mask.sum(1) == np.concatenate([mask.sum(1)] * 2)).all()

    def test_mlm_logits_shape_and_tied_decoder(self):
        key = jax.random.PRNGKey(9)
        params = bert_mod.init(key, TINY)
        head = mlm.head_init(jax.random.fold_in(key, 1), TINY)
        ids = jnp.ones((2, 8), jnp.int32)
        mask = jnp.ones((2, 8), jnp.int32)
        logits = mlm.mlm_logits(params, head, ids, mask, TINY, None)
        assert logits.shape == (2, 8, TINY.vocab_size)
        # decoder weight is tied to the word table: zeroing the table
        # collapses every logit to the decoder bias
        params2 = jax.tree_util.tree_map(lambda x: x, params)
        params2["embeddings"]["word"] = params["embeddings"]["word"] * 0.0
        logits2 = mlm.mlm_logits(params2, head, ids, mask, TINY, None)
        assert np.allclose(
            np.asarray(logits2),
            np.broadcast_to(np.asarray(head["decoder_bias"]), logits2.shape),
        )


def test_train_on_compact_vocab_matches_full(tmp_path):
    """TrainAndTest.train_on(compact_vocab=True) is a pure layout change:
    same injected BERT weights (compacted by row-gather) + same seeds give
    the same training history, and the exported checkpoint scatters the word
    table back to full-vocab rows."""
    import pickle

    from eeg_multimodal_tpu.train.api import TrainAndTest
    from test_trainer import TINY_BERT, tiny_dataset

    bert_full = bert_mod.init(jax.random.PRNGKey(3), TINY_BERT)
    train, test = tiny_dataset(12), tiny_dataset(8, seed=1)

    def run(compact, root):
        job = TrainAndTest(
            batch_size=4, learning_rate=1e-3, epochs=1, data_root=root,
            compute_dtype="float32", bert_params=bert_full, echo=False,
        )
        return job.train_on(
            train, test, "t", "r/", "ti", "lapacian_dropout",
            epsilon=1.0, bert_config=TINY_BERT, compact_vocab=compact,
        )

    full = run(False, str(tmp_path / "full"))
    comp = run(True, str(tmp_path / "comp"))
    for a, b in zip(full["history"], comp["history"]):
        np.testing.assert_allclose(a["train_loss"], b["train_loss"], rtol=1e-4)
        np.testing.assert_allclose(a["test_loss"], b["test_loss"], rtol=1e-4)


def test_row_regression_pretext():
    """row_reg_weight adds a masked-MSE term off the pooled output: loss
    increases by exactly weight*mse, gradient reaches the reg head, and
    weight=0 reproduces the MLM-only loss bitwise."""
    from eeg_multimodal_tpu.train import mlm

    tiny = bert_mod.BertConfig(
        vocab_size=64, hidden_size=16, num_layers=1, num_heads=2,
        intermediate_size=32, max_position_embeddings=12,
    )
    cfg0 = mlm.MLMConfig(mask_id=3, cls_id=1, sep_id=2, pad_id=0)
    cfg1 = mlm.MLMConfig(mask_id=3, cls_id=1, sep_id=2, pad_id=0,
                         row_reg_weight=0.5)
    bert = bert_mod.init(jax.random.PRNGKey(0), tiny)
    head = mlm.head_init(jax.random.PRNGKey(1), tiny, n_values=5)
    ids = jnp.asarray(np.random.RandomState(0).randint(4, 64, (3, 12)), jnp.int32)
    mask = jnp.ones_like(ids)
    vals = jnp.asarray(np.random.RandomState(1).randn(3, 5), jnp.float32)
    vmask = jnp.asarray([[1, 1, 1, 0, 0]] * 3, jnp.float32)
    key = jax.random.PRNGKey(2)

    base = float(mlm.mlm_loss(bert, head, ids, mask, tiny, cfg0, key,
                              train=False, values=vals, value_mask=vmask))
    plain = float(mlm.mlm_loss(bert, head, ids, mask, tiny, cfg0, key,
                               train=False))
    assert base == plain  # weight 0: values ignored

    joint = float(mlm.mlm_loss(bert, head, ids, mask, tiny, cfg1, key,
                               train=False, values=vals, value_mask=vmask))
    assert joint > plain  # mse is positive at random init

    g = jax.grad(
        lambda h: mlm.mlm_loss(bert, h, ids, mask, tiny, cfg1, key,
                               train=False, values=vals, value_mask=vmask)
    )(head)
    assert float(jnp.abs(g["reg"]["kernel"]).sum()) > 0
    # masked-out columns receive no gradient
    assert float(jnp.abs(g["reg"]["kernel"][:, 3:]).sum()) == 0.0


def test_build_value_targets_stacks_modalities():
    from eeg_multimodal_tpu.train import mlm

    eeg = np.random.RandomState(0).randn(4, 6) * 7 + 3
    act = np.random.RandomState(1).randn(3, 4) * 2
    vals, mask = mlm.build_value_targets([eeg, act])
    assert vals.shape == (7, 6) and mask.shape == (7, 6)
    assert mask[:4].sum() == 4 * 6 and mask[4:, :4].sum() == 3 * 4
    assert mask[4:, 4:].sum() == 0
    # standardized per modality per column
    np.testing.assert_allclose(vals[:4].mean(axis=0), 0, atol=1e-5)
    np.testing.assert_allclose(vals[:4].std(axis=0), 1, atol=1e-4)


def test_train_on_prebuilt_vocab_matches_compact(tmp_path):
    """train_on(vocab=...) with caller-remapped data (the MLM pipeline's
    calling convention) reproduces compact_vocab=True exactly and keeps the
    full-vocab checkpoint-export contract (ADVICE r2: without the vocab the
    exported word table stayed compact and `predict` would gather OOB)."""
    from eeg_multimodal_tpu.data.compact_vocab import (
        build_compact_vocab as bcv, remap_pairing,
    )
    from eeg_multimodal_tpu.train.api import TrainAndTest
    from test_trainer import TINY_BERT, tiny_dataset

    bert_full = bert_mod.init(jax.random.PRNGKey(3), TINY_BERT)
    train, test = tiny_dataset(12), tiny_dataset(8, seed=1)

    job = TrainAndTest(
        batch_size=4, learning_rate=1e-3, epochs=1,
        data_root=str(tmp_path / "a"), compute_dtype="float32",
        bert_params=bert_full, echo=False,
    )
    ref = job.train_on(
        train, test, "t", "r/", "ti", "lapacian_dropout",
        epsilon=1.0, bert_config=TINY_BERT, compact_vocab=True,
    )

    # caller does the remap itself, as pretrain_finetune_mlm does
    cv = bcv([train.eeg_input, test.eeg_input], full_vocab=TINY_BERT.vocab_size)
    bert_compact = dict(bert_full)
    emb = dict(bert_compact["embeddings"])
    emb["word"] = cv.compact_embeddings(emb["word"])
    bert_compact["embeddings"] = emb
    import dataclasses as dc

    job2 = TrainAndTest(
        batch_size=4, learning_rate=1e-3, epochs=1,
        data_root=str(tmp_path / "b"), compute_dtype="float32",
        bert_params=bert_compact, echo=False,
    )
    got = job2.train_on(
        remap_pairing(train, cv), remap_pairing(test, cv), "t", "r/", "ti",
        "lapacian_dropout", epsilon=1.0,
        bert_config=dc.replace(TINY_BERT, vocab_size=cv.size), vocab=cv,
    )
    for a, b in zip(ref["history"], got["history"]):
        np.testing.assert_allclose(a["train_loss"], b["train_loss"], rtol=1e-5)

    with pytest.raises(ValueError, match="either"):
        job2.train_on(
            train, test, "t", "r/", "ti", "lapacian_dropout",
            compact_vocab=True, vocab=cv,
        )


def test_trainer_export_params_expands_word_table():
    """With a compact vocab active, checkpoint export scatters the word table
    back to full-vocab rows (reference state-dict layout)."""
    import dataclasses

    from eeg_multimodal_tpu.train.trainer import TrainConfig, Trainer
    from test_trainer import TINY_BERT

    cv = build_compact_vocab([np.asarray([[1, 5, 7]])], full_vocab=TINY_BERT.vocab_size)
    fc = dataclasses.replace(
        __import__("eeg_multimodal_tpu.models.fusion", fromlist=["fusion"]).config_for(
            "ti", "lapacian_dropout"
        ),
        bert_config=dataclasses.replace(TINY_BERT, vocab_size=cv.size),
    )
    tr = Trainer(fc, TrainConfig(epochs=1), vocab=cv)
    exported = tr.export_params()
    word = np.asarray(exported["bert"]["embeddings"]["word"])
    assert word.shape == (TINY_BERT.vocab_size, TINY_BERT.hidden_size)
    np.testing.assert_array_equal(
        cv.compact_embeddings(word), np.asarray(tr.params["bert"]["embeddings"]["word"])
    )


def test_remap_raises_without_unk_row():
    """Unknown ids with no [UNK] row are a hard error, not a silent -1."""
    cv = build_compact_vocab([np.asarray([[1, 5, 7]])], full_vocab=64)
    with pytest.raises(ValueError, match="UNK"):
        cv.remap(np.asarray([9]))


def test_eval_loss_has_no_encoder_dropout():
    """eval_loss must measure without train-mode dropout: same key, train
    flag off -> deterministic logits; with dropout on the losses differ."""
    from eeg_multimodal_tpu.train.mlm import MLMConfig, mlm_loss

    cv = build_compact_vocab([toy_ids(jax.random.PRNGKey(0), 8, 16, 60)[0]],
                             full_vocab=512)
    tiny = bert_mod.BertConfig(
        vocab_size=cv.size, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=16,
    )
    cfg = MLMConfig(mask_id=cv.mask_id, cls_id=cv.cls_id, sep_id=cv.sep_id,
                    pad_id=cv.pad_id)
    full_ids, mask = toy_ids(jax.random.PRNGKey(0), 4, 16, 60)
    ids = cv.remap(full_ids)  # into the compact id space
    bert = bert_mod.init(jax.random.PRNGKey(2), tiny)
    from eeg_multimodal_tpu.train.mlm import head_init

    head = head_init(jax.random.PRNGKey(3), tiny)
    key = jax.random.PRNGKey(4)
    e1 = float(mlm_loss(bert, head, ids, mask, tiny, cfg, key, train=False))
    e2 = float(mlm_loss(bert, head, ids, mask, tiny, cfg, key, train=False))
    t1 = float(mlm_loss(bert, head, ids, mask, tiny, cfg, key, train=True))
    assert e1 == e2            # eval is dropout-free per key
    assert abs(t1 - e1) > 0    # train applies dropout noise
