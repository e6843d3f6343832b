"""Built-in check suite over the tokenized `sequences` table (the
north_rule four families).  Importing this package registers the checks."""

from ensembl_datacheck_spark.checks import core  # noqa: F401
from ensembl_datacheck_spark.checks import ops_checks  # noqa: F401
from ensembl_datacheck_spark.checks import spec_pack  # noqa: F401
