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


    def query(
        self,
        store: str,
        table: Optional[str] = None,
        expr: Optional[str] = None,
        columns: Optional[List] = None,
        rows: Optional[tuple] = None,
    ):
        """Filtered view of a stored table (the reference explorer's SQL
        box, expressed as pandas: ``expr`` is a DataFrame.query expression,
        ``columns`` a projection, ``rows`` an inclusive (start, stop) range
        pushed down to the store)."""
        if table is None:
            table = self.list_tables(store)[0]
        pointer = {"_": {"h5_file": store, "table": table}}
        obj = get_dt(pointer, "_", load_range=rows)
        df = obj if isinstance(obj, pd.DataFrame) else pd.DataFrame(np.asarray(obj))
        if expr:
            df = df.query(expr)
        if columns is not None:
            df = df[columns]
        return df


class ExplorerUI:  # pragma: no cover - needs notebook frontend
    """ipywidgets store browser mirroring the reference's DuckDBExplorer
    workflow (deepof/database_explorer.py:12-129): path box -> load ->
    table dropdown -> query area -> execute."""

    def __init__(self, table_path: str = ""):
        import ipywidgets as widgets

        self.path_input = widgets.Text(
            value=table_path, placeholder="Tables directory...",
            description="Path:", layout=widgets.Layout(width="80%"),
        )
        self.load_button = widgets.Button(
            description="Load stores", button_style="primary"
        )
        self.store_dropdown = widgets.Dropdown(
            description="Store:", layout=widgets.Layout(width="80%")
        )
        self.table_dropdown = widgets.Dropdown(
            description="Table:", layout=widgets.Layout(width="80%")
        )
        self.query_area = widgets.Textarea(
            description="Filter:", placeholder="pandas query expression",
            layout=widgets.Layout(width="100%", height="80px"),
        )
        self.execute_button = widgets.Button(
            description="Execute", button_style="success"
        )
        self.output = widgets.Output()
        self._explorer = None
        self.load_button.on_click(self._load)
        self.store_dropdown.observe(self._on_store, names="value")
        self.execute_button.on_click(self._execute)

    def display_ui(self):
        import ipywidgets as widgets
        from IPython.display import display

        display(widgets.VBox([
            widgets.HBox([self.path_input, self.load_button]),
            self.store_dropdown, self.table_dropdown,
            self.query_area, self.execute_button, self.output,
        ]))

    def _load(self, _):
        self._explorer = DatabaseExplorer(self.path_input.value.strip())
        stores = self._explorer.list_stores()
        self.store_dropdown.options = stores
        if stores:
            self.store_dropdown.value = stores[0]

    def _on_store(self, change):
        if self._explorer and change["new"]:
            tables = self._explorer.list_tables(change["new"])
            self.table_dropdown.options = tables
            if tables:
                self.table_dropdown.value = tables[0]

    def _execute(self, _):
        from IPython.display import display

        with self.output:
            self.output.clear_output()
            try:
                display(self._explorer.query(
                    self.store_dropdown.value, self.table_dropdown.value,
                    expr=self.query_area.value.strip() or None, rows=(0, 99),
                ))
            except Exception as e:
                print(f"Query failed: {e}")


def explore(table_path: str) -> DatabaseExplorer:
    """Convenience constructor used by notebooks."""
    return DatabaseExplorer(table_path)
