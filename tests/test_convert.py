"""HF BERT → flax conversion parity, offline (random weights, no downloads).

Builds a tiny randomly-initialized ``transformers.BertModel`` from a config
object (never touches the network), converts its state dict with
``convert_hf_bert``, and pins the flax forward against the torch forward —
so real pretrained MiniLM weights drop in correct when an environment has
them (VERDICT r2 missing #3 / task #10; ref team_run1.py:211-239)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tdr.models.convert import (                               # noqa: E402
    BertConfig, BertEncoder, convert_hf_bert, minilm_l12_config)

CFG = BertConfig(vocab_size=120, dim=32, depth=2, heads=4, mlp_hidden=64,
                 max_len=24, type_vocab_size=2)


@pytest.fixture(scope="module")
def hf_model():
    hf_cfg = transformers.BertConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.dim,
        num_hidden_layers=CFG.depth, num_attention_heads=CFG.heads,
        intermediate_size=CFG.mlp_hidden,
        max_position_embeddings=CFG.max_len,
        type_vocab_size=CFG.type_vocab_size, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=CFG.layer_norm_eps)
    torch.manual_seed(0)
    m = transformers.BertModel(hf_cfg, add_pooling_layer=False)
    m.eval()
    return m


def _torch_sentence_embed(m, ids, mask):
    """sentence-transformers semantics: masked mean pool + L2 norm."""
    with torch.no_grad():
        out = m(input_ids=torch.tensor(ids),
                attention_mask=torch.tensor(mask)).last_hidden_state
        mk = torch.tensor(mask, dtype=torch.float32)[..., None]
        pooled = (out * mk).sum(1) / mk.sum(1).clamp(min=1e-9)
        pooled = torch.nn.functional.normalize(pooled, dim=-1)
    return pooled.numpy()


class TestHfConversion:
    def test_forward_parity(self, hf_model):
        rng = np.random.RandomState(0)
        B, L = 3, 16
        ids = rng.randint(0, CFG.vocab_size, (B, L)).astype(np.int32)
        mask = np.ones((B, L), np.int32)
        mask[0, 10:] = 0                       # ragged padding
        mask[2, 5:] = 0

        ref = _torch_sentence_embed(hf_model, ids, mask)

        import jax.numpy as jnp

        params = convert_hf_bert(hf_model.state_dict(), CFG)
        enc = BertEncoder(CFG)
        got = np.asarray(enc.apply({"params": params},
                                   jnp.asarray(ids), jnp.asarray(mask)))
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)

    def test_prefixed_keys_accepted(self, hf_model):
        sd = {f"0.auto_model.{k}": v for k, v in hf_model.state_dict().items()}
        params = convert_hf_bert(sd, CFG)
        assert params["word_embeddings"]["embedding"].shape == (
            CFG.vocab_size, CFG.dim)

    def test_param_shapes_match_flax_init(self, hf_model):
        """Converted tree must be loadable where a fresh init is — same
        structure and shapes (the drop-in property)."""
        import jax
        import jax.numpy as jnp

        params = convert_hf_bert(hf_model.state_dict(), CFG)
        enc = BertEncoder(CFG)
        init = enc.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32))["params"]
        init = jax.tree_util.tree_map(
            lambda x: x.unbox() if hasattr(x, "unbox") else x, init,
            is_leaf=lambda x: hasattr(x, "unbox"))
        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(init))
        assert len(flat_a) == len(flat_b)
        for path, leaf in flat_a:
            assert path in flat_b, path
            assert leaf.shape == flat_b[path].shape, path

    def test_minilm_config_dims(self):
        c = minilm_l12_config()
        assert (c.depth, c.dim, c.heads, c.mlp_hidden) == (12, 384, 12, 1536)
        assert c.vocab_size == 250037


class TestConvertedEncoderServes:
    """VERDICT r4 #9: the converter's output must SERVE end-to-end, not
    just shape-check — wrap the converted ``BertEncoder`` in a
    ``DenseModel``, embed a corpus, retrieve through ``SentenceLmCascade``,
    and pin the dense stage against the torch model's own brute-force
    cosine ranking (same HF-format state dict on both sides)."""

    DOCS = [
        "alpine glaciers retreat meltwater lakes survey",
        "honeybees pollinate orchards nectar hives spring",
        "quantum qubits superposition interference algorithms",
        "printing press movable type books literacy europe",
        "coral reefs bleaching warm seawater symbiotic algae",
        "aqueduct arches stone gradient fountains roman",
        "volcanic ash plume jet engines aviation reroute",
        "desalination reverse osmosis membranes seawater pressure",
    ]

    def _dense(self, hf_model):
        from tdr.models.dense import DenseModel
        from tdr.utils.config import DenseConfig

        params = convert_hf_bert(hf_model.state_dict(), CFG)
        enc = BertEncoder(CFG)
        dcfg = DenseConfig(vocab_size=CFG.vocab_size, dim=CFG.dim,
                           max_len=CFG.max_len)
        docids = [f"d{i}" for i in range(len(self.DOCS))]
        return DenseModel.build(enc, params, dcfg, self.DOCS, docids,
                                batch=32)

    def test_dense_retrieve_matches_torch_cosine(self, hf_model):
        from tdr.text.hash_tokenizer import encode_batch

        dense = self._dense(hf_model)
        queries = ["glaciers meltwater", "qubits superposition",
                   "reverse osmosis membranes"]
        got = dense.retrieve(queries, k=3)

        # torch side: same hash tokenization, sentence-transformers pooling
        ids_d, mask_d = encode_batch(self.DOCS, CFG.vocab_size, CFG.max_len)
        ids_q, mask_q = encode_batch(queries, CFG.vocab_size, CFG.max_len)
        emb_d = _torch_sentence_embed(hf_model, ids_d, mask_d)
        emb_q = _torch_sentence_embed(hf_model, ids_q, mask_q)
        want = np.argsort(-(emb_q @ emb_d.T), axis=1)[:, :3]
        for g, w in zip(got, want):
            assert g[0] == f"d{w[0]}", (g, w)
            assert set(g) == {f"d{j}" for j in w}

    def test_serves_through_sentence_cascade(self, hf_model):
        from tdr.rank import SentenceBM25, SentenceLmCascade
        from tdr.utils.config import IndexConfig

        dense = self._dense(hf_model)
        docids = [f"d{i}" for i in range(len(self.DOCS))]
        sb = SentenceBM25.build(
            docids, self.DOCS, "en",
            index_cfg=IndexConfig(doc_pad_multiple=8, nnz_pad_multiple=64,
                                  head_budget_bytes=1 << 18))
        lm = SentenceLmCascade({"en": sb}, dense, bm25_candidates=8)
        sb.precompute_embeddings(dense)
        queries = ["coral bleaching seawater", "volcanic ash jet engines"]
        res = lm.retrieve(queries, ["en", "en"], k=3)
        assert res[0][0] == "d4"
        assert res[1][0] == "d6"
        # deterministic across calls (the serving property)
        assert lm.retrieve(queries, ["en", "en"], k=3) == res
