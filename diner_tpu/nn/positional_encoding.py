"""NeRF sin/cos positional encoding.

Parity target: reference ``src/models/positional_encoding.py:9-63`` — the
fused ``sin(phase + freq * x)`` trick with interleaved (sin, cos) per
frequency and optional input passthrough. Output layout per input dim d:
``[x (if include_input)] ++ [sin(f0·x), cos(f0·x), sin(f1·x), ...]`` where
the frequency axis is *interleaved across input dims* exactly like the
reference's (num_freqs*2, d_in) reshape.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class PositionalEncoding:
    num_freqs: int = 6
    d_in: int = 3
    freq_factor: float = math.pi
    include_input: bool = True

    @property
    def d_out(self) -> int:
        d = self.num_freqs * 2 * self.d_in
        if self.include_input:
            d += self.d_in
        return d

    def __call__(self, x):
        return positional_encode(
            x, self.num_freqs, self.freq_factor, self.include_input
        )


def positional_encode(x, num_freqs: int, freq_factor: float = math.pi,
                      include_input: bool = True):
    """Apply the encoding to (..., d_in) → (..., d_out).

    The flattened order matches the reference: for each of the
    ``2*num_freqs`` interleaved (sin f_k, cos f_k) rows, all ``d_in`` input
    dims, i.e. output[..., 2k*d : (2k+1)*d] = sin(f_k · x) etc.
    """
    freqs = freq_factor * (2.0 ** jnp.arange(num_freqs, dtype=x.dtype))
    freqs = jnp.repeat(freqs, 2)  # f0 f0 f1 f1 ...
    phases = jnp.zeros((2 * num_freqs,), dtype=x.dtype)
    phases = phases.at[1::2].set(0.5 * math.pi)

    # (..., 2F, d_in): sin(phase + freq * x)
    emb = jnp.sin(phases[:, None] + x[..., None, :] * freqs[:, None])
    emb = emb.reshape(x.shape[:-1] + (2 * num_freqs * x.shape[-1],))
    if include_input:
        emb = jnp.concatenate([x, emb], axis=-1)
    return emb
