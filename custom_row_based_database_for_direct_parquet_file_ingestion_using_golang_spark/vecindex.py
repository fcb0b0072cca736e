"""Persistent vector (IVF) indexes — ANN index artifacts through the
catalog, the same registry shape as materialized views (matview.py).

An index is two artifacts under the engine root:

* the corpus parquet re-written PARTITIONED BY ``list_id`` (the inverted
  lists — ``operators/similarity.ivf_build``), so a probe is a
  partition-pruned scan of ``n_probe`` directories, not a corpus pass;
* the coarse quantizer's centroids, stored in the registry JSON (they ARE
  the index metadata: n_centroids × dim doubles, corpus-size independent).

``search`` ranks centroids driver-side from the persisted quantizer and
reads only the probed lists (``ivf_probe_indexed`` — the PartitionFilter
is plan-asserted in tests/test_plans.py). ``refresh`` re-assigns the
CURRENT table against the EXISTING quantizer (one scan + write — the
standard serving posture: the quantizer is model state, retrained on
drift, not on every append); pass ``retrain=True`` to retrain it.

No reference equivalent (the reference has no vectors at all); the shape
follows FAISS's build-once/probe-many IVF contract re-expressed as Spark
partitioned storage.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame


class VectorIndexes:
    """Registry + lifecycle for persistent IVF indexes."""

    def __init__(self, engine):
        self.engine = engine
        self.path = os.path.join(engine.store.root, "vector_indexes.json")
        self.dir = os.path.join(engine.store.root, "_vector_indexes")

    # -- persistence ---------------------------------------------------------

    def _load(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def _save(self, meta: dict) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, self.path)

    def names(self) -> list[str]:
        return sorted(self._load())

    def __contains__(self, name: str) -> bool:
        return name in self._load()

    def _get(self, name: str) -> dict:
        meta = self._load()
        if name not in meta:
            raise ValueError(f"no such vector index: {name!r}")
        return meta[name]

    # -- lifecycle -----------------------------------------------------------

    def create(
        self,
        name: str,
        table: str,
        id_col: str,
        vec_col: str,
        n_centroids: int = 16,
        train_limit: int = 512,
        seed: int = 42,
    ) -> None:
        from .operators import similarity

        if name in self._load():
            raise ValueError(f"vector index {name!r} already exists")
        df = self.engine.table(table)
        for c in (id_col, vec_col):
            if c not in df.columns:
                raise ValueError(
                    f"table {table!r} has no column {c!r} "
                    f"(columns: {df.columns})"
                )
        idx_path = os.path.join(self.dir, name)
        centroids = similarity.ivf_build(
            df, id_col, vec_col, idx_path,
            n_centroids=n_centroids, train_limit=train_limit, seed=seed,
        )
        meta = self._load()
        meta[name] = {
            "table": table,
            "id_col": id_col,
            "vec_col": vec_col,
            "n_centroids": n_centroids,
            "train_limit": train_limit,
            "seed": seed,
            "path": idx_path,
            "centroids": [[float(x) for x in c] for c in centroids],
        }
        self._save(meta)

    def refresh(self, name: str, retrain: bool = False) -> str:
        """Rebuild the inverted lists from the table's CURRENT rows.

        Default keeps the existing quantizer (one assignment scan + one
        partitioned write; list membership of unchanged rows is stable).
        ``retrain=True`` re-trains the quantizer first — the drift lever,
        which may move any vector to a new list."""
        from pyspark.sql import functions as F

        from .operators import similarity
        from .operators.similarity import _argmax_1based, _centroid_dots

        m = self._get(name)
        df = self.engine.table(m["table"])
        if retrain:
            centroids = similarity.ivf_build(
                df, m["id_col"], m["vec_col"], m["path"],
                n_centroids=m["n_centroids"],
                train_limit=m["train_limit"], seed=m["seed"],
            )
            meta = self._load()
            meta[name]["centroids"] = [
                [float(x) for x in c] for c in centroids
            ]
            self._save(meta)
            return f"retrained + rebuilt {name!r} ({len(centroids)} lists)"
        listed = df.select(
            F.col(m["id_col"]),
            F.col(m["vec_col"]),
            _argmax_1based(
                _centroid_dots(F.col(m["vec_col"]), m["centroids"])
            ).alias("list_id"),
        )
        listed.write.mode("overwrite").partitionBy("list_id").parquet(
            m["path"]
        )
        return f"rebuilt {name!r} against the existing quantizer"

    def drop(self, name: str) -> None:
        m = self._get(name)
        meta = self._load()
        del meta[name]
        self._save(meta)
        shutil.rmtree(m["path"], ignore_errors=True)

    # -- query ---------------------------------------------------------------

    def search(
        self,
        name: str,
        query_vec: list[float],
        k: int = 10,
        n_probe: int = 4,
    ) -> DataFrame:
        from .operators import similarity

        m = self._get(name)
        return similarity.ivf_probe_indexed(
            self.engine.spark,
            m["path"],
            m["centroids"],
            m["id_col"],
            m["vec_col"],
            [float(x) for x in query_vec],
            k=k,
            n_probe=n_probe,
        )
