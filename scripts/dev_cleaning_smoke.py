# dev smoke: exec(open('scripts/dev_cleaning_smoke.py').read()) in warm REPL
import importlib
import sys

for _n in [n for n in sys.modules if n.startswith("pandas_plus_spark")]:
    del sys.modules[_n]
from pandas_plus_spark.operators import cleaning  # noqa: E402
import duckdb  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

rows = [
    (0, "mail me at bob.smith+x@example.co.uk or call +1 (555) 123-4567."),
    (1, "server at 192.168.0.1 ssn 123-45-6789 ok"),
    (2, "plain text line with words. and a sentence! ok?"),
    (3, "lorem ipsum dolor { code }"),
    (4, ""),
    (5, "one\ntwo three four five six ends here.\nshort line\nanother full line with words."),
]
df = spark.createDataFrame(rows, "id long, text string")

sel = [F.col("id")]
for cat, c in cleaning.pii_counts("text").items():
    sel.append(c.alias(f"n_{cat}"))
sel.append(cleaning.redact_pii("text").alias("red"))
for k, c in cleaning.c4_line_stats("text").items():
    sel.append(c.alias(k))
for k, c in cleaning.c4_flags("text").items():
    sel.append(c.alias(k))
sel.append(cleaning.c4_keep("text").alias("keep"))
out = df.select(*sel).toPandas().set_index("id")

con = duckdb.connect()
con.register("t", df.select("id", "text").toPandas())
dsel = ["id"]
for cat in cleaning.PII_ORDER:
    dsel.append(cleaning.sql_pii_count("text", cat) + f" AS n_{cat}")
dsel.append(cleaning.sql_redact_pii("text") + " AS red")
duck = con.sql("SELECT " + ", ".join(dsel) + " FROM t").df().set_index("id")

bad = []
for c in duck.columns:
    for i in duck.index:
        a, b = out.loc[i, c], duck.loc[i, c]
        if a != b:
            bad.append((i, c, a, b))
print("PII spark-vs-duck mismatches:", bad if bad else "NONE")
print(out.to_string())
print("SMOKE-DONE")
