"""Neural grapheme-to-phoneme model for OOV words, trained in-framework.

The reference falls back to the pretrained ``g2p_en`` seq2seq for words
missing from its lexicon (reference ``litfass/synthesis/g2p.py:4,30``).
That model cannot be downloaded offline, so this module provides the
TPU-native equivalent: a small transformer encoder/decoder over
characters -> ARPABET phones that trains on any CMUdict-format lexicon
in minutes (``train_neural_g2p``), plus greedy decoding under ``jit``
with fully static shapes (fixed word/pronunciation lengths, ``fori_loop``
decode — no data-dependent Python control flow).

Usage:
    model = train_neural_g2p(lexicon)          # dict word -> phones
    model.save(path)                            # .npz bundle
    model = NeuralG2P.load(path)
    phones = model(["hello", "zyzzyva"])       # batch of OOV words

``synthesis.g2p.EnglishG2P`` accepts ``neural=model`` and routes OOV
words through it instead of the rule LTS.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

PAD, BOS, EOS = 0, 1, 2
MAX_WORD = 28    # characters
MAX_PHONES = 36  # output tokens (incl. EOS)


def _char_vocab() -> Dict[str, int]:
    chars = list("abcdefghijklmnopqrstuvwxyz'-.")
    return {c: i + 3 for i, c in enumerate(chars)}


class _Block(nn.Module):
    d: int
    heads: int = 4
    causal: bool = False

    @nn.compact
    def __call__(self, x, mask, ctx=None, ctx_mask=None):
        T = x.shape[1]
        attn_mask = mask[:, None, None, :]
        if self.causal:
            tri = jnp.tril(jnp.ones((T, T), bool))
            attn_mask = attn_mask & tri[None, None, :, :]
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.d
        )(x, x, mask=attn_mask)
        x = nn.LayerNorm()(x + h)
        if ctx is not None:
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, qkv_features=self.d
            )(x, ctx, mask=ctx_mask[:, None, None, :])
            x = nn.LayerNorm()(x + h)
        h = nn.Dense(self.d * 4)(x)
        h = nn.Dense(self.d)(nn.relu(h))
        return nn.LayerNorm()(x + h)


class G2PTransformer(nn.Module):
    """2+2-layer encoder/decoder; ~400k params at d=96."""

    n_chars: int
    n_phones: int
    d: int = 96
    layers: int = 2

    def setup(self):
        self.char_emb = nn.Embed(self.n_chars, self.d)
        self.phone_emb = nn.Embed(self.n_phones, self.d)
        self.pos_enc = self.param(
            "pos_enc", nn.initializers.normal(0.02),
            (max(MAX_WORD, MAX_PHONES), self.d),
        )
        self.enc_blocks = [_Block(self.d) for _ in range(self.layers)]
        self.dec_blocks = [
            _Block(self.d, causal=True) for _ in range(self.layers)
        ]
        self.head = nn.Dense(self.n_phones)

    def encode(self, chars):
        mask = chars != PAD
        x = self.char_emb(chars) + self.pos_enc[None, : chars.shape[1]]
        for blk in self.enc_blocks:
            x = blk(x, mask)
        return x, mask

    def decode(self, tokens, enc, enc_mask):
        mask = jnp.ones(tokens.shape, bool)  # causal mask handles padding
        x = self.phone_emb(tokens) + self.pos_enc[None, : tokens.shape[1]]
        for blk in self.dec_blocks:
            x = blk(x, mask, enc, enc_mask)
        return self.head(x)

    def __call__(self, chars, tokens):
        enc, enc_mask = self.encode(chars)
        return self.decode(tokens, enc, enc_mask)


class NeuralG2P:
    """Inference wrapper: word strings -> ARPABET phone lists."""

    def __init__(self, params, char2id: Dict[str, int],
                 phone_list: Sequence[str], d: int = 96):
        self.char2id = dict(char2id)
        self.phone_list = list(phone_list)
        self.model = G2PTransformer(
            n_chars=len(self.char2id) + 3,
            n_phones=len(self.phone_list) + 3,
            d=d,
        )
        self.params = params
        self._decode = jax.jit(self._decode_impl)
        self._cache: Dict[str, List[str]] = {}

    def encode_word(self, word: str) -> np.ndarray:
        ids = [self.char2id[c] for c in word.lower() if c in self.char2id]
        ids = ids[:MAX_WORD]
        return np.asarray(ids + [PAD] * (MAX_WORD - len(ids)), np.int32)

    def _decode_impl(self, params, chars):
        enc, enc_mask = self.model.apply(
            params, chars, method=G2PTransformer.encode
        )
        B = chars.shape[0]
        toks = jnp.full((B, MAX_PHONES + 1), PAD, jnp.int32)
        toks = toks.at[:, 0].set(BOS)

        def body(i, toks):
            logits = self.model.apply(
                params, toks[:, :-1], enc, enc_mask,
                method=G2PTransformer.decode,
            )
            nxt = jnp.argmax(logits[:, i], axis=-1).astype(jnp.int32)
            return toks.at[:, i + 1].set(nxt)

        toks = jax.lax.fori_loop(0, MAX_PHONES, body, toks)
        return toks[:, 1:]

    def __call__(self, words: Sequence[str]) -> List[List[str]]:
        out: List[Optional[List[str]]] = [self._cache.get(w) for w in words]
        todo = [i for i, o in enumerate(out) if o is None]
        if todo:
            chars = np.stack([self.encode_word(words[i]) for i in todo])
            toks = np.asarray(self._decode(self.params, jnp.asarray(chars)))
            for row, i in enumerate(todo):
                phones: List[str] = []
                for t in toks[row]:
                    if t in (EOS, PAD):
                        break
                    if t >= 3:
                        phones.append(self.phone_list[int(t) - 3])
                out[i] = phones
                self._cache[words[i]] = phones
        return out  # type: ignore[return-value]

    # ------------------------------------------------------------- persist
    def save(self, path) -> None:
        from flax.serialization import to_bytes

        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(
            path,
            params=np.frombuffer(to_bytes(self.params), np.uint8),
            meta=json.dumps({
                "char2id": self.char2id,
                "phone_list": self.phone_list,
                "d": self.model.d,
            }),
        )

    @classmethod
    def load(cls, path) -> "NeuralG2P":
        from flax.serialization import from_bytes

        data = np.load(Path(path), allow_pickle=False)
        meta = json.loads(str(data["meta"]))
        model = G2PTransformer(
            n_chars=len(meta["char2id"]) + 3,
            n_phones=len(meta["phone_list"]) + 3,
            d=meta["d"],
        )
        chars = jnp.zeros((1, MAX_WORD), jnp.int32)
        toks = jnp.zeros((1, MAX_PHONES), jnp.int32)
        template = model.init(jax.random.PRNGKey(0), chars, toks)
        params = from_bytes(template, data["params"].tobytes())
        return cls(params, meta["char2id"], meta["phone_list"], d=meta["d"])


def _prepare_dataset(
    lexicon: Dict[str, List[str]],
    char2id: Dict[str, int],
    phone2id: Dict[str, int],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static-shape (chars, dec_in, dec_target) arrays."""
    xs, tin, tout = [], [], []
    for word, phones in lexicon.items():
        cids = [char2id[c] for c in word.lower() if c in char2id]
        pids = [phone2id[p] for p in phones if p in phone2id]
        if not cids or not pids:
            continue
        if len(cids) > MAX_WORD or len(pids) >= MAX_PHONES:
            continue
        xs.append(cids + [PAD] * (MAX_WORD - len(cids)))
        seq_in = [BOS] + pids
        seq_out = pids + [EOS]
        tin.append(seq_in + [PAD] * (MAX_PHONES - len(seq_in)))
        tout.append(seq_out + [PAD] * (MAX_PHONES - len(seq_out)))
    return (np.asarray(xs, np.int32), np.asarray(tin, np.int32),
            np.asarray(tout, np.int32))


def train_neural_g2p(
    lexicon: Dict[str, List[str]],
    steps: int = 3000,
    batch_size: int = 128,
    lr: float = 1e-3,
    d: int = 96,
    seed: int = 0,
    verbose: bool = False,
) -> NeuralG2P:
    """Teacher-forced cross-entropy training on a word->phones dict
    (CMUdict format via ``G2P.load_lexicon``). Static shapes throughout;
    one jitted update re-used every step."""
    import optax

    char2id = _char_vocab()
    phone_list = sorted({p for ph in lexicon.values() for p in ph})
    phone2id = {p: i + 3 for i, p in enumerate(phone_list)}
    chars, tin, tout = _prepare_dataset(lexicon, char2id, phone2id)
    n = len(chars)
    if n == 0:
        raise ValueError("empty/unusable lexicon")

    model = G2PTransformer(
        n_chars=len(char2id) + 3, n_phones=len(phone_list) + 3, d=d
    )
    params = model.init(
        jax.random.PRNGKey(seed),
        jnp.asarray(chars[:1]), jnp.asarray(tin[:1]),
    )
    optimizer = optax.adamw(lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def update(params, opt_state, bc, bi, bo):
        def loss_fn(p):
            logits = model.apply(p, bc, bi)
            mask = (bo != PAD).astype(jnp.float32)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, bo)
            return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    for step in range(steps):
        idx = rng.integers(n, size=batch_size)
        params, opt_state, loss = update(
            params, opt_state,
            jnp.asarray(chars[idx]), jnp.asarray(tin[idx]),
            jnp.asarray(tout[idx]),
        )
        if verbose and step % 200 == 0:
            print(f"g2p step {step}: loss {float(loss):.4f}", flush=True)
    return NeuralG2P(params, char2id, phone_list, d=d)
