"""Replication strategies (S1): recorded keyspace properties.

Reference: ReplicationStrategies/SimpleReplicationStrategy.cs:7,
NetworkTopologyReplicationStrategy.cs:8,
CassandraReplicationStrategyFactory.cs:17-37. Cassandra bakes the
strategy into the CREATE KEYSPACE DDL; on a Spark warehouse replication
is the storage layer's job (HDFS replication factor / S3 redundancy),
so the engine records the *declared* strategy as a keyspace property
(``properties.json`` next to the tables) — the deployment contract an
operator maps onto the actual filesystem, and round-trippable the way
the reference's options are.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class SimpleReplicationStrategy:
    """Single-DC replication factor (SimpleReplicationStrategy.cs:9-14:
    factor must be ≥ 1)."""

    replication_factor: int = 1

    def __post_init__(self):
        if self.replication_factor < 1:
            raise ValueError(
                "replication factor should be at least 1 (default is 1), "
                f"got {self.replication_factor}"
            )

    def to_property(self) -> dict:
        return {
            "class": "SimpleStrategy",
            "replication_factor": self.replication_factor,
        }


@dataclass(frozen=True)
class NetworkTopologyReplicationStrategy:
    """Per-datacenter replication factors
    (NetworkTopologyReplicationStrategy.cs:10-16: at least one DC)."""

    datacenters: tuple[tuple[str, int], ...]

    def __post_init__(self):
        if not self.datacenters:
            raise ValueError("at least one datacenter configuration is required")

    def to_property(self) -> dict:
        prop: dict = {"class": "NetworkTopologyStrategy"}
        for name, rf in self.datacenters:
            prop[name] = rf
        return prop


def replication_strategy_factory(
    strategy: str = "simple",
    replication_factor: int = 1,
    datacenters: list[str] | None = None,
):
    """Mirror of CassandraReplicationStrategyFactory.GetReplicationStrategy
    (CassandraReplicationStrategyFactory.cs:17-37): 'simple' →
    SimpleReplicationStrategy(rf); 'network_topology' → one
    DataCenterSettings per named DC, all at ``replication_factor``."""
    if strategy.lower() == "simple":
        return SimpleReplicationStrategy(replication_factor)
    if strategy.lower() == "network_topology":
        return NetworkTopologyReplicationStrategy(
            tuple((dc, replication_factor) for dc in (datacenters or []))
        )
    raise ValueError(f"unknown replication strategy {strategy!r}")
