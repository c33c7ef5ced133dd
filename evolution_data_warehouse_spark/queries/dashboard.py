"""The composed dashboard view as an oracle-checked query.

Re-expresses ``analytics.v_tableau_bord_territorial``
(Terraform/sql/005_create_datamarts.sql:207-254): a geo × time spine
(CROSS JOIN, reference :234-236), direct LEFT JOINs for datamarts
already at dashboard grain, and NULLIF-guarded LEFT JOINs on
aggregated subqueries (:239-251) for the datamarts kept at a finer
grain (per-sector, per-statut) that must be re-rolled-up to
(geo, annee).

The Spark side goes through the actual view layer
(plans/datamarts.create_datamarts) so the parity check exercises the
same nested-view expansion a dashboard user hits; the oracle inlines
the same views as CTEs. Re-aggregations of already-decimal-exact
double measures re-cast to DECIMAL so both engines stay
order-independent and bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from evolution_data_warehouse_spark.queries.common import register

_DASHBOARD_ORACLE = """
WITH vm_demographie AS (
    SELECT n.n_name AS geo_name, year(o.o_orderdate) AS annee,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_spend,
           COUNT(*) AS n_orders,
           CASE WHEN COUNT(*) > 0
                THEN CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE) END AS avg_order
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name, year(o.o_orderdate)
),
vm_entreprises AS (
    SELECT n.n_name AS geo_name, year(o.o_orderdate) AS annee,
           p.p_brand AS secteur,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,2))) AS DOUBLE)
               AS chiffre_affaires
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY n.n_name, year(o.o_orderdate), p.p_brand
),
vm_revenus AS (
    SELECT n.n_name AS geo_name,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,2))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS avg_balance,
           MIN(c.c_acctbal) AS min_balance,
           MAX(c.c_acctbal) AS max_balance
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
),
vm_emploi AS (
    SELECT n.n_name AS geo_name, year(o.o_orderdate) AS annee,
           l.l_returnflag AS statut,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(28,2))) AS DOUBLE)
               AS population_active,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                         THEN CAST(l.l_quantity AS DECIMAL(28,2))
                         ELSE CAST(0 AS DECIMAL(28,2)) END) AS DOUBLE)
               AS population_chomeurs
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name, year(o.o_orderdate), l.l_returnflag
)
SELECT g.n_name AS geo_name, t.annee,
       demo.total_spend, demo.n_orders, demo.avg_order,
       ent.chiffre_affaires AS ca_entreprises,
       rev.avg_balance,
       emp.taux_chomage_calc AS taux_chomage
FROM nation g
CROSS JOIN (SELECT DISTINCT year(o_orderdate) AS annee FROM orders) t
LEFT JOIN vm_demographie demo
    ON demo.geo_name = g.n_name AND demo.annee = t.annee
LEFT JOIN (
    SELECT annee, geo_name,
           CAST(SUM(CAST(chiffre_affaires AS DECIMAL(28,2))) AS DOUBLE)
               AS chiffre_affaires
    FROM vm_entreprises
    GROUP BY annee, geo_name
) ent ON ent.geo_name = g.n_name AND ent.annee = t.annee
LEFT JOIN vm_revenus rev ON rev.geo_name = g.n_name
LEFT JOIN (
    SELECT annee, geo_name,
           CAST(SUM(CAST(population_chomeurs AS DECIMAL(28,2))) AS DOUBLE)
           / NULLIF(CAST(SUM(CAST(population_active AS DECIMAL(28,2)))
                         AS DOUBLE), 0.0) * 100.0 AS taux_chomage_calc
    FROM vm_emploi
    GROUP BY annee, geo_name
) emp ON emp.geo_name = g.n_name AND emp.annee = t.annee
"""


@register(
    "view_dashboard_twograin",
    _DASHBOARD_ORACLE,
    doc="Composed dashboard view parity: geo × time spine with direct "
    "and re-aggregated NULLIF-guarded LEFT JOIN datamart subqueries. "
    "Ref: 005_create_datamarts.sql:207-254 "
    "(v_tableau_bord_territorial); tested via the live view layer.",
)
def view_dashboard_twograin(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deferred import: plans.datamarts reads queries.common through the
    # queries package, so a module-level import here would be circular.
    from evolution_data_warehouse_spark.plans.datamarts import (
        create_datamarts,
    )

    create_datamarts(spark, sf_dir)
    return spark.table("vm_tableau_bord")
