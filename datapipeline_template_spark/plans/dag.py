"""Tiny deterministic DAG runner.

The reference relies on two implicit mechanisms: lexicographic file
ordering (`00_config_loader.py:8-11`) and SDP's dependency resolution
from decorator registrations (`01_bronze_ingestion.py:68-74`). We make
the graph explicit: each dataset is a node with declared dependencies;
execution is topological order (stable: insertion order among ready
nodes).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

__all__ = ["Dataset", "Dag"]


@dataclass
class Dataset:
    name: str
    build: Callable[[], object]
    deps: tuple[str, ...] = ()
    kind: str = "batch"  # batch | stream | view


@dataclass
class Dag:
    nodes: dict[str, Dataset] = field(default_factory=dict)

    def add(self, dataset: Dataset) -> None:
        if dataset.name in self.nodes:
            raise ValueError(f"duplicate dataset {dataset.name!r}")
        self.nodes[dataset.name] = dataset

    def topo_order(self) -> list[Dataset]:
        order: list[Dataset] = []
        done: set[str] = set()
        pending = list(self.nodes.values())
        while pending:
            ready = [d for d in pending if all(dep in done for dep in d.deps)]
            if not ready:
                cyc = [d.name for d in pending]
                raise ValueError(f"dependency cycle or missing dep among {cyc}")
            for d in ready:
                order.append(d)
                done.add(d.name)
            pending = [d for d in pending if d.name not in done]
        return order

    def run(self) -> dict[str, object]:
        return {d.name: d.build() for d in self.topo_order()}
