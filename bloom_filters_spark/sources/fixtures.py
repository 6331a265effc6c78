"""Reference-shaped deterministic fixtures (FIXTURES.md §2).

- words:  10 000 rows of 10-char lowercase strings — the words.txt
  analogue (generator the reference left commented out,
  Bloom_project/src/core/Bloom_project.cpp:573-591; Utils.cpp:113-123),
  seeded so known member "hpuelitwch" and non-member "11111111" behave
  as in the reference probes (:4828-4829).
- users:  the SQLite users2 table analogue
  (Bloom_project/src/core/Bloom_project.cpp:3784-3827):
  id, name='User{i+1}', phone='+123456789{i+1}', column3..column10.
- sales_lines: CSV rendered as whole raw line strings (the reference
  never parses columns — :3674-3680), with the verbatim header row its
  probes use (:4313).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..kernels.hashing import splitmix64

_U64 = np.uint64
KNOWN_MEMBER = "hpuelitwch"      # Bloom_project/src/core/Bloom_project.cpp:4829
KNOWN_ABSENT = "11111111"        # :4828
SALES_HEADER = ("Region,Country,Item Type,Sales Channel,Order Priority,"
                "Order Date,Order ID,Ship Date,Units Sold,Unit Price,"
                "Unit Cost,Total Revenue,Total Cost,Total Profit")


def words_df(spark: SparkSession, n: int = 10_000) -> DataFrame:
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(_U64)
            rows = []
            for i in ids:
                if i == 0:
                    rows.append(KNOWN_MEMBER)
                    continue
                h = splitmix64(np.arange(10, dtype=_U64)
                               + i * _U64(2_654_435_761))
                rows.append("".join(chr(97 + int(x % _U64(26))) for x in h))
            yield pd.DataFrame({"value": rows})
    return spark.range(n).mapInPandas(gen, schema="value string")


def users_df(spark: SparkSession, n: int = 1000) -> DataFrame:
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy() + 1
            data = {"id": ids,
                    "name": [f"User{i}" for i in ids],
                    "phone": [f"+123456789{i}" for i in ids]}
            for c in range(3, 11):
                data[f"column{c}"] = [f"Data{c}"] * len(ids)
            yield pd.DataFrame(data)
    schema = ("id long, name string, phone string, " +
              ", ".join(f"column{c} string" for c in range(3, 11)))
    return spark.range(n).mapInPandas(gen, schema=schema)


def sales_lines_df(spark: SparkSession, n: int = 1000) -> DataFrame:
    regions = ["Europe", "Asia", "Sub-Saharan Africa", "North America"]
    countries = ["Portugal", "Poland", "Grenada", "Japan", "Kenya"]
    items = ["Fruit", "Meat", "Office Supplies", "Clothes"]

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(_U64)
            rows = []
            for i in ids:
                if i == 0:
                    rows.append(SALES_HEADER)
                    continue
                h = splitmix64(np.arange(8, dtype=_U64) + i * _U64(40503))
                units = int(h[3] % _U64(10_000))
                price = float(h[4] % _U64(50_000)) / 100.0
                rows.append(
                    f"{regions[int(h[0]) % len(regions)]},"
                    f"{countries[int(h[1]) % len(countries)]},"
                    f"{items[int(h[2]) % len(items)]},Online,H,"
                    f"1/{1 + int(h[5]) % 28}/2020,{int(i)},"
                    f"2/{1 + int(h[6]) % 28}/2020,{units},{price:.2f},"
                    f"{price * 0.7:.2f},{units * price:.2f},"
                    f"{units * price * 0.7:.2f},{units * price * 0.3:.2f}")
            yield pd.DataFrame({"value": rows})
    return spark.range(n).mapInPandas(gen, schema="value string")
