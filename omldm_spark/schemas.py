"""StructTypes mirroring the reference's POJO surface (SURVEY.md §1.3).

Citations are into ``/root/reference/``:

* ``DataInstance`` fields observable at
  ``src/main/scala/omldm/utils/parsers/dataStream/DataPointParser.scala:17-47``.
* ``Request`` fields observable at
  ``src/main/scala/omldm/utils/parsers/requestStream/PipelineMap.scala:18-48``
  and ``src/main/scala/omldm/operators/spoke/FlinkSpoke.scala:184,203-215``.
* ``Prediction`` / ``QueryResponse`` per
  ``src/main/scala/omldm/network/FlinkNetwork.scala:193-231,250-255``.
* ``Statistics`` / ``JobStatistics`` per
  ``src/main/scala/omldm/operators/hub/FlinkHub.scala:118-127`` and
  ``src/main/scala/omldm/utils/statistics/StatisticsOperator.scala:110-127``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# Operations a DataInstance may carry (DataPointParser.scala:42-46).
OP_TRAINING = "training"
OP_FORECASTING = "forecasting"

# End-of-stream sentinel dropped by the parser (DataInstanceParser.scala:14).
EOS_SENTINEL = "EOS"

DATA_INSTANCE_SCHEMA = StructType(
    [
        StructField("id", LongType()),  # replay/order key (engine-added)
        StructField("numericalFeatures", ArrayType(DoubleType())),
        StructField("discreteFeatures", ArrayType(IntegerType())),
        StructField("categoricalFeatures", ArrayType(StringType())),
        StructField("target", DoubleType()),
        StructField("operation", StringType()),
    ]
)

LEARNER_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("hyperParameters", MapType(StringType(), StringType())),
        StructField("parameters", MapType(StringType(), ArrayType(DoubleType()))),
        StructField("dataStructure", MapType(StringType(), StringType())),
    ]
)

PREPROCESSOR_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("hyperParameters", MapType(StringType(), StringType())),
    ]
)

REQUEST_SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("request", StringType()),  # Create|Update|Query|Delete
        StructField("requestId", LongType()),
        StructField("learner", LEARNER_SCHEMA),
        StructField("preProcessors", ArrayType(PREPROCESSOR_SCHEMA)),
        StructField("trainingConfiguration", MapType(StringType(), StringType())),
    ]
)

PREDICTION_SCHEMA = StructType(
    [
        StructField("pipelineId", LongType()),
        StructField("recordId", LongType()),
        StructField("prediction", DoubleType()),
    ]
)

QUERY_RESPONSE_SCHEMA = StructType(
    [
        StructField("responseId", LongType()),
        StructField("mlpId", StringType()),
        StructField("protocol", StringType()),
        StructField("dataFitted", LongType()),
        StructField("loss", DoubleType()),
        StructField("cumulativeLoss", DoubleType()),
        StructField("score", DoubleType()),
        StructField("parameters", MapType(StringType(), ArrayType(DoubleType()))),
    ]
)

STATISTICS_SCHEMA = StructType(
    [
        StructField("pipeline", IntegerType()),
        StructField("protocol", StringType()),
        StructField("modelsShipped", LongType()),
        StructField("bytesShipped", LongType()),
        StructField("numOfBlocks", LongType()),
        StructField("fitted", LongType()),
        StructField("learningCurveY", ArrayType(DoubleType())),
        StructField("learningCurveX", ArrayType(LongType())),
    ]
)

# Learner / preprocessor whitelists (PipelineMap.scala:66-69).
# MaxAbsScaler, Normalizer and RobustScaler extend the reference whitelist
# (SURVEY.md §2.11): MaxAbs reuses the chain's running min/max moments,
# Normalizer is stateless, RobustScaler keeps a bounded per-dim value-count
# histogram (exact disc quantiles, counter-addition mergeable).
VALID_LEARNERS = {"PA", "RegressorPA", "ORR", "SVM", "MultiClassPA", "K-means", "NN", "HT"}
VALID_PREPROCESSORS = {"PolynomialFeatures", "StandardScaler", "MinMaxScaler",
                       "MaxAbsScaler", "Normalizer", "RobustScaler"}

# Learners forced onto the SingleLearner protocol (FlinkSpoke.scala:203-211).
SINGLE_LEARNER_ONLY = {"K-means", "HT"}

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
