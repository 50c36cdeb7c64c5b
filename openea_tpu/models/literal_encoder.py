"""Literal encoder for MultiKE (reference approaches/literal_encoder.py).

Literals -> [literal_len, word2vec_dim] token matrices -> deep autoencoder
(hidden 1024/512/dim, tanh/sigmoid, Adagrad 0.01 on reconstruction MSE) ->
encoded literal vectors.  Words missing from the word2vec vocabulary get
character-mean vectors; the reference trains a gensim character Word2Vec
for those (literal_encoder.py:150-190) — here characters use the same
deterministic hashed vectors as data/name_vectors.py, so the pipeline has
no gensim dependency and stays reproducible.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from openea_tpu.data.name_vectors import _hash_vector
from openea_tpu.ops.optim import get_optimizer


def is_number(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def clear_attribute_triples(attribute_triples):
    """Keep attributes with >= 10 triples; strip datatype/lang markup and
    punctuation; drop http values (reference multi_ke.py:193-238)."""
    attr_num: Dict = {}
    for _, a, _ in attribute_triples:
        attr_num[a] = attr_num.get(a, 0) + 1
    keep = {a for a, n in attr_num.items() if n >= 10}
    step1 = {(e, a, v) for e, a, v in attribute_triples if a in keep}

    out, lit_num, lit_str = [], [], []
    for e, a, v in step1:
        v = str(v).strip('"')
        if '"^^' in v:
            v = v[:v.index('"^^')]
        for suffix in ('"@en', '"@eng'):
            if v.endswith(suffix):
                v = v[:v.index(suffix)]
        (lit_num if is_number(v) else lit_str).append(v)
        v = (v.replace(".", "").replace("(", "").replace(")", "")
             .replace(",", "").replace('"', "")
             .replace("_", " ").replace("-", " ").replace("/", " "))
        if "http" in v:
            continue
        out.append((e, a, v))
    return out, lit_num, lit_str


def literal_token_matrices(literal_list: List[str],
                           word2vec: Optional[Dict[str, np.ndarray]],
                           literal_len: int, wv_dim: int) -> np.ndarray:
    """[n_literals, literal_len, wv_dim] token matrices with char-mean
    fallback vectors for unlisted words."""
    char_cache: Dict[str, np.ndarray] = {}

    def char_vec(word: str) -> np.ndarray:
        acc = np.zeros(wv_dim, np.float32)
        for ch in word:
            if ch not in char_cache:
                char_cache[ch] = _hash_vector("chr:" + ch, wv_dim)
            acc += char_cache[ch]
        return acc / max(len(word), 1)

    word_cache: Dict[str, np.ndarray] = {}
    out = np.zeros((len(literal_list), literal_len, wv_dim), np.float32)
    for li, literal in enumerate(literal_list):
        words = literal.split(" ")
        for i in range(min(literal_len, len(words))):
            w = words[i]
            if w not in word_cache:
                v = word2vec.get(w) if word2vec else None
                word_cache[w] = (np.asarray(v, np.float32) if v is not None
                                 else char_vec(w))
            out[li, i] = word_cache[w]
    return out


class AutoEncoder:
    """JAX port of the reference AutoEncoderModel: flattened token mats ->
    encoder/decoder MLP, reconstruction MSE, Adagrad(0.01)."""

    def __init__(self, word_vec_mats: np.ndarray, args, hidden=None,
                 seed: int = 0):
        self.args = args
        n, L, wv = word_vec_mats.shape
        self.input_dim = L * wv
        hidden = list(hidden or [1024, 512, int(args.dim)])
        dims = [self.input_dim] + hidden
        self.layer_num = len(hidden)
        x = word_vec_mats.reshape(n, self.input_dim)
        if args.encoder_normalize:
            norms = np.linalg.norm(x, axis=1, keepdims=True)
            x = x / np.maximum(norms, 1e-12)
        self.data = x.astype(np.float32)

        key = jax.random.PRNGKey(seed)
        p = {}
        for i in range(self.layer_num):
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            p[f"enc_w{i}"] = jax.random.normal(k1, (dims[i], dims[i + 1])) * 0.05
            p[f"enc_b{i}"] = jax.random.normal(k2, (dims[i + 1],)) * 0.05
            j = self.layer_num - i
            p[f"dec_w{i}"] = jax.random.normal(k3, (dims[j], dims[j - 1])) * 0.05
            p[f"dec_b{i}"] = jax.random.normal(k4, (dims[j - 1],)) * 0.05
        self.params = p
        self.opt = get_optimizer("Adagrad", 0.01)
        self.opt_state = self.opt.init(self.params)

        act_name = str(args.encoder_active)

        def act(x):
            if act_name == "sigmoid":
                return jax.nn.sigmoid(x)
            if act_name == "tanh":
                return jnp.tanh(x)
            return x

        def encode(p, x):
            for i in range(self.layer_num):
                x = act(x @ p[f"enc_w{i}"] + p[f"enc_b{i}"])
            if args.encoder_normalize:
                # tf.nn.l2_normalize with no axis -> global normalization
                x = x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x), 1e-12))
            return x

        def decode(p, x):
            for i in range(self.layer_num):
                x = act(x @ p[f"dec_w{i}"] + p[f"dec_b{i}"])
            return x

        self._encode = jax.jit(encode)

        @jax.jit
        def step(p, opt_state, batch):
            def loss_fn(p):
                return jnp.mean(jnp.square(decode(p, encode(p, batch)) - batch))

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, opt_state = self.opt.update(grads, opt_state, p)
            return optax.apply_updates(p, updates), opt_state, loss

        self._step = step

    def train(self, epochs: int, batch_size: int):
        """One jitted scan per epoch (the per-step float(loss) sync cost
        a device round trip per batch — the dominant cost of MultiKE's
        init at 15K scale); losses fetched only on print epochs."""
        n = len(self.data)
        bsz = min(batch_size, n)
        nb = max(1, n // bsz)
        # one H2D upload, shared with encode_all (the [n, L*wv] literal
        # matrix is ~0.5 GB at 15K scale; the tunnel re-upload was a
        # large share of MultiKE's init time)
        if not hasattr(self, "_data_dev"):
            self._data_dev = jnp.asarray(self.data)
        body = self._data_dev[:nb * bsz].reshape(nb, bsz, -1)
        tail = (self._data_dev[nb * bsz:]
                if n > nb * bsz else None)
        step = self._step

        @jax.jit
        def epoch_fn(p, opt_state, batches):
            def body_fn(carry, batch):
                p, o = carry
                p, o, loss = step(p, o, batch)
                return (p, o), loss

            (p, opt_state), losses = jax.lax.scan(body_fn, (p, opt_state),
                                                  batches)
            return p, opt_state, jnp.sum(losses)

        for ep in range(1, epochs + 1):
            t = time.time()
            self.params, self.opt_state, loss_sum = epoch_fn(
                self.params, self.opt_state, body)
            if tail is not None:
                self.params, self.opt_state, tl = self._step(
                    self.params, self.opt_state, tail)
                loss_sum = loss_sum + tl
            if ep % 20 == 0 or ep == 1:
                print("epoch {} of literal encoder, loss: {:.4f}, time: "
                      "{:.4f}s".format(ep, float(loss_sum), time.time() - t))

    def encode_all(self, batch_size: int = 4096) -> np.ndarray:
        if not hasattr(self, "_data_dev"):
            self._data_dev = jnp.asarray(self.data)
        outs = []
        for s in range(0, len(self.data), batch_size):
            outs.append(self._encode(self.params,
                                     self._data_dev[s:s + batch_size]))
        # one blocking D2H at the end instead of one per batch
        return np.concatenate([np.asarray(o) for o in outs], axis=0)


class LiteralEncoder:
    """Protocol-compatible wrapper (reference literal_encoder.py:193-214)."""

    def __init__(self, literal_list: List[str],
                 word2vec: Optional[Dict[str, np.ndarray]], args,
                 word2vec_dimension: int):
        mats = literal_token_matrices(literal_list, word2vec,
                                      int(args.literal_len), word2vec_dimension)
        model = AutoEncoder(mats, args)
        model.train(int(args.encoder_epoch), int(args.batch_size))
        self.encoded_literal_vector = model.encode_all()
