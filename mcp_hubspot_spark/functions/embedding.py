"""Pluggable batch embedding (SURVEY §2.9 V1, §2.11).

The reference embeds JSON-serialized records with SentenceTransformer
all-MiniLM-L6-v2 (384-d) in one batched ``model.encode`` call (reference
``utils.py:12-23``, ``server.py:77-92``). That is the one compute kernel
not expressible in built-in Spark SQL, so it is a scalar *pandas* UDF:
Arrow-batched, one model instance per executor (lazy singleton), never
row-at-a-time.

The embedder is pluggable (SURVEY §7 hardest-problems #2): the default is a
deterministic hash-based embedder so tests and CI need no model download;
the SentenceTransformer path activates only if the library is importable.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

DEFAULT_DIM = 384

_MODEL_SINGLETON = {}  # per-executor-process cache


def _hash_embed_one(text: str, dim: int) -> np.ndarray:
    """Deterministic pseudo-embedding: seed a per-text RNG from md5, draw a
    unit-norm vector. Stable across processes/platforms (no PYTHONHASHSEED
    dependence)."""
    seed = int.from_bytes(hashlib.md5(text.encode("utf-8")).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    n = float(np.linalg.norm(v))
    if n == 0.0 or math.isnan(n):
        v = np.zeros(dim, dtype=np.float32)
        v[0] = 1.0
        return v
    return v / n


def make_embed_udf(dim: int = DEFAULT_DIM, model_name: str | None = None):
    """Return a pandas UDF ``string -> array<float>``.

    ``model_name`` given and importable → SentenceTransformer (per-executor
    singleton, batched encode). Otherwise → deterministic hash embedder.
    """

    @pandas_udf(ArrayType(FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        if model_name is not None:
            try:
                from sentence_transformers import SentenceTransformer

                model = _MODEL_SINGLETON.get(model_name)
                if model is None:
                    model = SentenceTransformer(model_name)
                    _MODEL_SINGLETON[model_name] = model
                mat = model.encode(
                    texts.fillna("").tolist(), normalize_embeddings=True
                )
                return pd.Series([row.astype(np.float32) for row in mat])
            except ImportError:
                pass  # fall through to the deterministic embedder
        return pd.Series(
            [_hash_embed_one(t if t is not None else "", dim) for t in texts]
        )

    return embed


def embed_column(text_col: Column | str, dim: int = DEFAULT_DIM,
                 model_name: str | None = None) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return make_embed_udf(dim=dim, model_name=model_name)(c)
