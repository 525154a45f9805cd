"""Lakehouse layout: one root, conventional per-layer table paths.

Mirrors the reference's fixed ADLS paths (``bronze/bronze_rx_claims_load.py:18-21``,
``silver/silver_rx_claims_load.py:19-23``, ``gold/gold_rx_claims_load.py:16-26``)
as a relocatable structure so tests and deployments pick any root.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class LakehousePaths:
    root: str

    def _p(self, *parts: str) -> str:
        return os.path.join(self.root, *parts)

    @property
    def bronze_claims(self) -> str:
        return self._p("bronze", "rx_claims")

    @property
    def silver_claims(self) -> str:
        return self._p("silver", "rx_claims")

    @property
    def quarantine(self) -> str:
        return self._p("silver", "rx_claims_dq_failures")

    @property
    def watermarks(self) -> str:
        return self._p("control", "watermarks")

    @property
    def silver_members(self) -> str:
        return self._p("silver", "members")

    @property
    def silver_providers(self) -> str:
        return self._p("silver", "providers")

    @property
    def dim_date(self) -> str:
        return self._p("gold", "dim_date")

    @property
    def dim_member(self) -> str:
        return self._p("gold", "dim_member")

    @property
    def dim_provider(self) -> str:
        return self._p("gold", "dim_provider")

    @property
    def fact_claims(self) -> str:
        return self._p("gold", "fact_rx_claims")

    @property
    def agg_by_provider(self) -> str:
        return self._p("gold", "agg_claims_by_provider")

    @property
    def agg_by_month(self) -> str:
        return self._p("gold", "agg_claims_by_month")
