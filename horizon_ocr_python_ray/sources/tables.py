"""Schema-clean parquet table reads for the driver's sf tables.

The driver-generated test tables carry a ``pandas`` metadata blob in the
parquet footer. pyarrow schemas with metadata dicts are UNHASHABLE, which
makes Ray Data's schema-dedup (``transform_pyarrow.unify_schemas``) log a
``Failed to hash the schemas`` warning on every read operator — noise that
buries real warnings. :func:`read_sf_table` reads the footer schema once on
the driver (metadata-only, no data scan), strips the metadata, prunes it to
the requested columns, and hands the clean schema to ``read_parquet`` so
every downstream block hashes and the log stays quiet. Column pruning
semantics are identical to a plain ``read_parquet(columns=...)``.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data


def clean_schema(path: str, columns: list[str] | None = None) -> pa.Schema:
    """Footer schema of ``path``, metadata-stripped and column-pruned."""
    import pyarrow.parquet as pq

    full = pq.read_schema(path).remove_metadata()
    if columns is None:
        return full
    return pa.schema([full.field(c) for c in columns])


def read_sf_table(sf_dir: str, name: str,
                  columns: list[str] | None = None) -> ray.data.Dataset:
    """``read_parquet(f"{sf_dir}/{name}.parquet", columns=...)`` with an
    explicit clean schema (see module docstring)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    return ray.data.read_parquet(path, columns=columns,
                                 schema=clean_schema(path, columns))
