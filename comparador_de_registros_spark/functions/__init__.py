"""Scalar parity layer.

Each module offers (a) a plain-Python batch implementation — the golden
semantics, used inside vectorized pandas UDFs and by parity tests — and
(b) where expressible, an equivalent pyspark Column expression builder
that stays JVM-side / whole-stage-codegen'd.
"""

from comparador_de_registros_spark.functions.unicode_fold import (  # noqa: F401
    fold_ascii,
    fold_ascii_col,
)
from comparador_de_registros_spark.functions.normalize import (  # noqa: F401
    padroniza,
    padroniza_col,
    minusculo_sem_acento,
    minusculo_sem_acento_col,
)
from comparador_de_registros_spark.functions.phonetic import soundex  # noqa: F401
from comparador_de_registros_spark.functions.fuzzy import (  # noqa: F401
    indel_ratio,
    token_set_ratio,
    jaccard_ratio,
)
