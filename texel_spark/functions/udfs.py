"""Vectorized (Arrow-batched) pandas UDFs.

NOTE: no ``from __future__ import annotations`` here - pandas_udf infers
the eval type from the *resolved* type hints.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType


@pandas_udf(LongType())
def morton_z(tx: pd.Series, ty: pd.Series) -> pd.Series:
    """Vectorized Morton interleave (numpy int64 bit ops, no per-row Python)."""
    from ..grid.morton import to_z_np

    return pd.Series(to_z_np(tx.to_numpy("int64"), ty.to_numpy("int64")))


@pandas_udf(LongType())
def morton_x(z: pd.Series) -> pd.Series:
    from ..grid.morton import from_z_np

    return pd.Series(from_z_np(z.to_numpy("int64"))[0])


@pandas_udf(LongType())
def morton_y(z: pd.Series) -> pd.Series:
    from ..grid.morton import from_z_np

    return pd.Series(from_z_np(z.to_numpy("int64"))[1])


def hilbert_udf(zoom: int):
    """Hilbert d-index pandas UDF bound to a zoom (grid order 2^zoom)."""

    @pandas_udf(LongType())
    def _hilbert(tx: pd.Series, ty: pd.Series) -> pd.Series:
        from .cellkeys import hilbert_key

        return pd.Series(hilbert_key(tx.to_numpy("int64"), ty.to_numpy("int64"), zoom))

    return _hilbert
