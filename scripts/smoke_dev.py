# dev smoke — exec'd inside the warm REPL: exec(open('scripts/smoke_dev.py').read())
import sys
for _n in [n for n in sys.modules if n.startswith('pandas_plus_spark')]:
    del sys.modules[_n]
import pandas_plus_spark.groupby.pivot as ct
import pandas_plus_spark.functions.binning as binning
import pandas_plus_spark.functions.encoding as enc
import pandas_plus_spark.functions.text as tx
import pandas_plus_spark.nanops as nanops
import pandas_plus_spark.sources.tables as tb
from pandas_plus_spark.groupby.core import GroupBy
import pyspark.sql.functions as F

t = tb.load_tables(spark, '/root/testdata/sf0.001')

li = t['lineitem']
ev = t['events']
docs = t['documents']

print("== masked sum ==")
GroupBy(li, 'l_returnflag').sum('l_quantity', mask=F.col('l_discount') > 0.05).show(3)

print("== agg multi ==")
GroupBy(li, 'l_returnflag').agg({
    'sum_qty': ('sum', 'l_quantity'),
    'avg_price': ('mean', 'l_extendedprice'),
    'n': ('count', 'l_quantity'),
    'med_qty': ('median', 'l_quantity'),
    'sd_qty': ('std', 'l_quantity'),
}).show(3)

print("== margins ==")
GroupBy(li, ['l_returnflag', 'l_linestatus']).sum('l_quantity', margins=True).show(20)

print("== transform ==")
GroupBy(li, 'l_returnflag').sum('l_quantity', transform=True).select('l_returnflag', 'l_quantity_sum').show(3)

print("== first/last ==")
GroupBy(li, 'l_returnflag', order_by=['l_orderkey', 'l_linenumber']).agg({
    'first_qty': ('first', 'l_quantity'), 'last_qty': ('last', 'l_quantity')}).show(3)

print("== ratio/subset/density/vc ==")
GroupBy(li, 'l_returnflag').ratio('l_extendedprice', 'l_quantity').show(3)
GroupBy(li, 'l_returnflag').subset_ratio('l_quantity', F.col('l_discount') > 0.05).show(3)
GroupBy(li, 'l_returnflag').density('l_quantity').show(3)
GroupBy(li, 'l_returnflag').value_counts(normalize=True).show(3)

print("== head/nth ==")
g = GroupBy(li, 'l_returnflag', order_by=['l_orderkey', 'l_linenumber'])
print(g.head(2, values=['l_quantity']).count(), g.nth(-1, values=['l_quantity']).count())

print("== cum/rolling/shift ==")
ge = GroupBy(ev, 'user_id', order_by=['ts', 'event_id'])
ge.cumsum('value').select('user_id', 'value', 'value_cumsum').show(3)
ge.rolling_mean('value', window=3, min_periods=1).select('user_id', 'value_rolling_mean').show(3)
ge.shift('value').select('user_id', 'value_shift').show(3)
ge.cumcount().select('user_id', 'cumcount').show(3)

print("== sessionize ==")
ges = GroupBy(ev.withColumn('ts_s', F.unix_timestamp('ts')), 'user_id')
ges.group_nearby_members('ts_s', max_diff=3600).select('user_id', 'ts_s', 'session_id').show(5)

print("== crosstab ==")
ct.crosstab(li, 'l_returnflag', 'l_linestatus', 'l_quantity', 'sum', margins=True, column_values=['F', 'O']).show(10)

print("== pretty_cut / bools / lincomb ==")
li.select(binning.pretty_cut('l_quantity', [10, 25, 40]).alias('bin')).groupBy('bin').count().show()
li.select(enc.bools_to_categorical(
    ['__a', '__b'], ['A', 'B']).alias('lab')) if False else None
li.withColumn('__a', F.col('l_discount') > 0.05).withColumn('__b', F.col('l_tax') > 0.04) \
  .select(enc.bools_to_categorical(['__a', '__b'], ['A', 'B']).alias('lab')).groupBy('lab').count().show()
li.select(enc.linear_combination({'l_quantity': 2.0, 'l_discount': -1.0}).alias('lc')).agg(F.sum('lc')).show()

print("== nanops ==")
nanops.reduce_frame(li, {'l_quantity': ['sum', 'mean', 'std'], 'l_extendedprice': ['max']}).show()

print("== text ==")
toks = tx.simple_tokens(F.col('text'))
docs.select(
    'doc_id',
    tx.token_count('text').alias('n_tok'),
    tx.bpe_ish_token_count('text').alias('n_bpe'),
    tx.poly_hash('text').alias('fp'),
    tx.lang_id(toks).alias('pred_lang'),
    tx.quality_score('text').alias('q'),
    F.size(tx.word_ngrams(toks, 3)).alias('n_tri'),
).show(5)
print("SMOKE OK")
