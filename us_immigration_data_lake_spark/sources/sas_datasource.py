"""sas7bdat as a first-class Spark data source (Python DataSource API,
Spark 4): ``spark.read.format("sas7bdat").load(path)`` after one
``register_sas_datasource(spark)`` call.

Same execution shape as sources/sas.py:read_sas_distributed — one
whole file per input partition (sas7bdat pages are not byte-splittable
without a JVM reimplementation), each task streaming pandas' parser in
bounded-memory chunks — but packaged behind the reader API so the
format composes with everything ``spark.read`` implies: schema
inference from the file metadata, option passing, and uniform call
sites. Rows travel back as Arrow RecordBatches (the API's fast path),
never per-row Python objects.

Reference provenance: the raw I-94 monthlies the reference loads with
``pandas.read_sas`` (notebook cell-7, 25 minutes single-threaded) are
exactly the files this source parallelizes file-per-task.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from us_immigration_data_lake_spark.sources.sas import list_sas_files, sas_schema


def _path_option(options) -> str:
    try:
        return options["path"]
    except KeyError:
        raise ValueError(
            "sas7bdat source requires a path: "
            "spark.read.format('sas7bdat').load('/dir/of/files')"
        ) from None


class SasDataSource(DataSource):
    """``format("sas7bdat")``; options: ``path`` (file or directory),
    ``chunksize`` (rows per Arrow batch, default 100000)."""

    @classmethod
    def name(cls) -> str:
        return "sas7bdat"

    def schema(self):
        return sas_schema(list_sas_files(_path_option(self.options))[0])

    def reader(self, schema) -> "SasReader":
        return SasReader(self.options, schema)


class SasReader(DataSourceReader):
    def __init__(self, options, schema):
        self._files = list_sas_files(_path_option(options))
        self._chunksize = int(options.get("chunksize", 100_000))
        self._names = [f.name for f in schema.fields]
        self._schema = schema

    def partitions(self):
        # one whole file per partition: the format's split granularity
        return [InputPartition(p) for p in self._files]

    def read(self, partition):
        import pandas as pd
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        # pandas hands back ns-precision datetimes; Spark's Arrow
        # ingestion wants exactly the schema's types (us timestamps),
        # so each batch casts to the declared Arrow schema
        arrow_schema = to_arrow_schema(self._schema)
        with pd.read_sas(
            partition.value,
            format="sas7bdat",
            encoding="utf-8",
            chunksize=self._chunksize,
            iterator=True,
        ) as rdr:
            for chunk in rdr:
                tbl = pa.Table.from_pandas(
                    chunk[self._names], preserve_index=False
                ).cast(arrow_schema)
                yield from tbl.to_batches()


def register_sas_datasource(spark) -> None:
    spark.dataSource.register(SasDataSource)
