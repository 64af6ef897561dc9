"""Multi-tenant catalog: the S4 bootstrap surface.

Reference: EventStoreStartup.cs:37-79 ensures per-tenant storage at
startup under a distributed lock and reacts to tenant-list changes.
Here the warehouse directory IS the catalog (a database per tenant
keyspace); ensure/bootstrap is idempotent filesystem creation, so the
reference's lock is unnecessary (SURVEY §2 S4).
"""

from __future__ import annotations

from inception_eventstore_spark.sources.layout import (
    EventStoreLayout,
    _fs_session,
    for_tenant,
)


class EventStoreCatalog:
    """Tenant registry over one warehouse root."""

    def __init__(self, warehouse: str, base_keyspace: str = "eventstore",
                 bounded_context: str | None = None, spark=None):
        self.warehouse = warehouse
        self.base_keyspace = base_keyspace
        self.bounded_context = bounded_context
        self.spark = spark

    def keyspaces(self) -> list[str]:
        """Existing keyspace directories under the warehouse — always the
        Hadoop FileSystem API (file:/, hdfs:/, s3a:/ all behave the
        same), via the catalog's session or the active one."""
        from inception_eventstore_spark.sources import fsutil

        return fsutil.list_dirs(_fs_session(self.spark), self.warehouse)

    def tenants(self) -> list[str]:
        """Tenant names recovered from ``{tenant}_{base}`` keyspaces."""
        suffix = "_" + self.base_keyspace.lower()
        return [k[: -len(suffix)] for k in self.keyspaces() if k.endswith(suffix)]

    def ensure_tenant(self, tenant: str, spark=None) -> EventStoreLayout:
        """S4: idempotent per-tenant bootstrap (pass ``spark`` for
        non-local warehouse URIs — see layout.for_tenant)."""
        return for_tenant(
            self.warehouse, tenant, self.base_keyspace, self.bounded_context,
            spark=spark,
        )

    def ensure_tenants(self, tenants: list[str],
                       spark=None) -> dict[str, EventStoreLayout]:
        """Bootstrap every tenant in the (possibly updated) tenant list —
        the reaction to tenant-list changes in the reference's startup."""
        return {t: self.ensure_tenant(t, spark=spark) for t in tenants}

    def wipe_tenant(self, tenant: str, spark=None) -> None:
        """S3 with the same tenant guard."""
        layout = EventStoreLayout(
            warehouse=self.warehouse,
            keyspace=f"{tenant}_{self.base_keyspace}".lower(),
        )
        layout.wipe(tenant, spark=spark)
