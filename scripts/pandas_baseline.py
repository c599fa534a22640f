#!/usr/bin/env python3
"""Reference-architecture throughput baseline (dev tooling, driver-side env).

The reference engine is single-threaded eager pandas. This script runs the
flagship q_pipeline_pretam shape with the reference's own idioms (eager
pandas merges/drop_duplicates, reference-style helper functions) over the
same sf parquet, so BASELINE.md can compare engine vs reference-architecture
wall time at identical scale.

Usage: python3 scripts/pandas_baseline.py [sfDir]
"""
import sys
import time

import pandas as pd


def main(sf_dir: str) -> None:
    t0 = time.time()
    lineitem = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    part = pd.read_parquet(f"{sf_dir}/part.parquet")
    t_read = time.time() - t0

    t0 = time.time()
    # FY filter (reference :515-518 shape)
    df = lineitem[(lineitem["l_shipdate"] >= "1997-07-01")
                  & (lineitem["l_shipdate"] <= "1998-06-30")].copy()
    # derived keys (reference :252-278 shape)
    df["li_key"] = df["l_orderkey"].astype(str) + "-" + df["l_linenumber"].astype(str)
    df["qty_code"] = (df["l_quantity"].astype(str).str.strip()
                      .str.replace(r"\.0$", "", regex=True))
    # lookup joins against deduped dims (reference :289-308 shape)
    odim = orders[["o_orderkey", "o_orderstatus"]].drop_duplicates()
    df = df.merge(odim, how="left", left_on="l_orderkey", right_on="o_orderkey")
    pdim = part[part["p_size"] <= 25][["p_partkey", "p_name", "p_brand"]].drop_duplicates()
    df = df.merge(pdim, how="left", left_on="l_partkey", right_on="p_partkey")
    # fallback fill (reference :297-302 shape)
    df["item_name"] = df["p_name"].fillna("UNKNOWN")
    # business-key dedup keep-first under explicit order (reference :339-343)
    df = df.sort_values(["l_linenumber", "l_quantity"], kind="mergesort")
    df = df.drop_duplicates(subset=["l_orderkey", "l_partkey"], keep="first")
    # ordered rename projection (reference :362-400 shape)
    out = pd.DataFrame({
        "row_key": df["li_key"], "item_code": df["l_partkey"],
        "order_status": df["o_orderstatus"], "item_name": df["item_name"],
        "brand": df["p_brand"], "qty_code": df["qty_code"],
        "adj_reason_code": "INT"})
    out = out.sort_values(["row_key", "item_code"], kind="mergesort")
    t_pipeline = time.time() - t0
    print(f"pandas pretam: read={t_read:.2f}s pipeline={t_pipeline:.2f}s "
          f"total={t_read + t_pipeline:.2f}s rows={len(out)}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
