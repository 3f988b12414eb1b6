"""Out-of-core table browser.

Behavioral spec: deepof/database_explorer.py:12+ — an interactive browser
over the project's on-disk table store. The reference browses DuckDB files;
this build's out-of-core store is HDF5 (deepof_tpu.core.storage), so the
explorer lists/loads those, with the same workflow: discover stores, list
tables, preview rows.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import h5py
import numpy as np
import pandas as pd

from deepof_tpu.core.storage import get_dt


class DatabaseExplorer:
    """Browse the HDF5-backed table store of a project directory."""

    def __init__(self, table_path: str):
        if not os.path.isdir(table_path):
            raise FileNotFoundError(table_path)
        self.table_path = table_path

    def list_stores(self) -> List[str]:
        """All .h5 store files under the Tables directory."""
        out = []
        for root, _, files in os.walk(self.table_path):
            for f in files:
                if f.endswith(".h5"):
                    out.append(os.path.join(root, f))
        return sorted(out)

    def list_tables(self, store: str) -> List[str]:
        with h5py.File(store, "r") as f:
            return sorted(f.keys())

    def table_info(self, store: str, table: Optional[str] = None) -> Dict:
        """Shape/column metadata without loading the data."""
        if table is None:
            table = self.list_tables(store)[0]
        pointer = {"_": {"h5_file": store, "table": table}}
        return get_dt(pointer, "_", only_metainfo=True)

    def head(self, store: str, table: Optional[str] = None, n: int = 10):
        """First n rows of a stored table."""
        if table is None:
            table = self.list_tables(store)[0]
        pointer = {"_": {"h5_file": store, "table": table}}
        obj = get_dt(pointer, "_", load_range=(0, n - 1))
        return obj

    def summary(self) -> pd.DataFrame:
        """One row per (store, table) with shape information."""
        rows = []
        for store in self.list_stores():
            try:
                for table in self.list_tables(store):
                    info = self.table_info(store, table)
                    rows.append(
                        {
                            "store": os.path.relpath(store, self.table_path),
                            "table": table,
                            "shape": info.get("shape"),
                        }
                    )
            except OSError:
                continue
        return pd.DataFrame(rows)


def explore(table_path: str) -> DatabaseExplorer:
    """Convenience constructor used by notebooks."""
    return DatabaseExplorer(table_path)
