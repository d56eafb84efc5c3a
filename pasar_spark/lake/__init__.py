from pasar_spark.lake.schema import Field, TableSchema  # noqa: F401
from pasar_spark.lake.table import LakeTable  # noqa: F401
