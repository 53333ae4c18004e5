"""Fourth N-version engine: the headline six in pure pandas.

The reference's benchmark table times every task on FOUR engines
(sqldf / base R / dplyr / data.table, RDataFramesSQL.Rmd:139-152).
Our table had three versions (fluent DataFrame, Spark-SQL text,
DuckDB); this module adds the single-machine dataframe-library rung —
pandas — completing the reference's 4-engine format with the closest
Python analogue of data.table/dplyr.

Semantics mirror queries/reference.py exactly (same cent-exact sums,
same tie-breaks, same NULLS LAST); ``tests/test_nversion_pandas.py``
asserts row-for-row equality against the DuckDB oracle, and bench.py
times these under the ``pandas`` column of the N-version table.

Scale note (why this is NOT the engine): pandas is single-process,
whole-table-in-memory — the honest single-node comparator, exactly
like the baseline engines it stands in for. It stops where the
se1000 crossover starts.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd


def load_tables(sf_dir: str, names: list[str]) -> dict[str, pd.DataFrame]:
    return {
        n: pd.read_parquet(os.path.join(sf_dir, f"{n}.parquet")) for n in names
    }


def q1_yearly_top_order(t: dict[str, pd.DataFrame]) -> pd.DataFrame:
    li, orders = t["lineitem"], t["orders"]
    up = li[li["l_returnflag"] == "N"].copy()
    up["yr"] = up["l_shipdate"].dt.year.astype("int32")
    counts = (
        up.groupby(["l_orderkey", "yr"], as_index=False)
        .size()
        .rename(columns={"size": "n_upvotes"})
    )
    counts = counts.sort_values(
        ["yr", "n_upvotes", "l_orderkey"], ascending=[True, False, True]
    )
    top = counts.groupby("yr", as_index=False).head(1)
    out = top.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    return out[["yr", "o_orderkey", "o_orderpriority", "n_upvotes"]].sort_values(
        "yr", ignore_index=True
    )


def q2_top_customers_by_spend(t: dict[str, pd.DataFrame]) -> pd.DataFrame:
    orders, cust = t["orders"], t["customer"]
    o = orders.copy()
    fin_c = np.where(
        o["o_orderstatus"] == "F",
        np.round(o["o_totalprice"] * 100).astype("int64"),
        0,
    )
    has_fin = (o["o_orderstatus"] == "F").astype("int64")
    o["fin_c"], o["has_fin"] = fin_c, has_fin
    agg = o.groupby("o_custkey").agg(
        fin_c=("fin_c", "sum"),
        n_fin=("has_fin", "sum"),
        max_order_price=("o_totalprice", "max"),
        n_orders=("o_orderkey", "size"),
    )
    agg["finished_spend"] = np.where(
        agg["n_fin"] > 0, np.round(agg["fin_c"] / 100.0, 2), np.nan
    )
    best = (
        o.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                      ascending=[True, False, True])
        .groupby("o_custkey", as_index=False)
        .head(1)[["o_custkey", "o_orderkey"]]
        .rename(columns={"o_orderkey": "best_orderkey"})
    )
    out = (
        agg.reset_index()
        .merge(best, on="o_custkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
    )
    out = out.sort_values(
        ["finished_spend", "c_custkey"], ascending=[False, True],
        na_position="last",
    ).head(10)
    return out[
        ["c_custkey", "c_name", "c_mktsegment", "finished_spend",
         "max_order_price", "n_orders", "best_orderkey"]
    ].reset_index(drop=True)


def q3_top_orders_by_big_items(t: dict[str, pd.DataFrame]) -> pd.DataFrame:
    li, orders = t["lineitem"], t["orders"]
    counts = (
        li[li["l_quantity"] > 25]
        .groupby("l_orderkey", as_index=False)
        .size()
        .rename(columns={"size": "n_big_items"})
    )
    out = counts.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    out = out.sort_values(
        ["n_big_items", "o_orderkey"], ascending=[False, True]
    ).head(10)
    return out[
        ["o_orderkey", "o_orderstatus", "o_totalprice", "n_big_items"]
    ].reset_index(drop=True)


def q4_price_spread(t: dict[str, pd.DataFrame]) -> pd.DataFrame:
    li, orders = t["lineitem"], t["orders"]
    best = li.groupby("l_orderkey", as_index=False)["l_extendedprice"].max()
    best = best.rename(columns={"l_extendedprice": "max_price"})
    first = (
        li[li["l_linenumber"] == 1]
        .groupby("l_orderkey", as_index=False)["l_extendedprice"].min()
        .rename(columns={"l_extendedprice": "first_price"})
    )
    out = best.merge(first, on="l_orderkey")
    out["price_spread"] = out["max_price"] - out["first_price"]
    out = out[out["price_spread"] > 1000].merge(
        orders, left_on="l_orderkey", right_on="o_orderkey"
    )
    out = out.sort_values(["price_spread", "o_orderkey"], ascending=[False, True])
    return out[
        ["o_orderkey", "o_orderpriority", "max_price", "first_price", "price_spread"]
    ].reset_index(drop=True)


def q5_user_event_totals(t: dict[str, pd.DataFrame]) -> pd.DataFrame:
    ev = t["events"].copy()
    ev["v_c"] = np.round(ev["value"] * 100).astype("int64")
    totals = ev.groupby(["user_id", "event_type"]).agg(
        v_c=("v_c", "sum"), n_events=("event_id", "size")
    )
    totals["total_value"] = np.round(totals["v_c"] / 100.0, 2)
    big = (
        ev[ev["value"] > 100]
        .groupby(["user_id", "event_type"], as_index=False)["value"].max()
        .rename(columns={"value": "max_big_value"})
    )
    out = totals.reset_index().merge(big, on=["user_id", "event_type"])
    out = out.sort_values(
        ["total_value", "user_id", "event_type"], ascending=[False, True, True]
    ).head(10)
    return out[
        ["user_id", "event_type", "total_value", "n_events", "max_big_value"]
    ].reset_index(drop=True)


def q6_distinct_suppliers_of_qualifying_brands(
    t: dict[str, pd.DataFrame],
) -> pd.DataFrame:
    part, li = t["part"], t["lineitem"]
    supp, nat = t["supplier"], t["nation"]
    small = part[part["p_size"] < 15].copy()
    small["cents"] = np.round(small["p_retailprice"] * 100).astype("int64")
    b = small.groupby("p_brand").agg(cnt=("p_partkey", "size"), cents=("cents", "sum"))
    b["avg"] = b["cents"] / 100.0 / b["cnt"]
    brands = b[(b["cnt"] >= 2) & b["avg"].between(905.0, 952.0)].index
    qparts = part[part["p_brand"].isin(brands)]["p_partkey"]
    keys = li[li["l_partkey"].isin(set(qparts))]["l_suppkey"].drop_duplicates()
    out = (
        keys.to_frame()
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    )
    return (
        out[["s_suppkey", "s_name", "n_name", "s_acctbal"]]
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )


#: name -> (tables needed, function)
PANDAS_QUERIES = {
    "q1_yearly_top_order": (["lineitem", "orders"], q1_yearly_top_order),
    "q2_top_customers_by_spend": (["orders", "customer"], q2_top_customers_by_spend),
    "q3_top_orders_by_big_items": (["lineitem", "orders"], q3_top_orders_by_big_items),
    "q4_price_spread": (["lineitem", "orders"], q4_price_spread),
    "q5_user_event_totals": (["events"], q5_user_event_totals),
    "q6_distinct_suppliers_of_qualifying_brands": (
        ["part", "lineitem", "supplier", "nation"],
        q6_distinct_suppliers_of_qualifying_brands,
    ),
}
