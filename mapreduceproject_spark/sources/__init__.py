from mapreduceproject_spark.sources.catalog import TABLES, load_table, load_tables  # noqa: F401
from mapreduceproject_spark.sources.store import SdfsStore  # noqa: F401
