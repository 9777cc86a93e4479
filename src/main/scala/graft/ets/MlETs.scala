package graft.ets

import org.apache.spark.ml.{Estimator, Model, PredictionModel}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.{BooleanParam, DoubleParam, FloatParam, IntParam, LongParam, Param, Params}
import org.apache.spark.ml.util.MLWritable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import graft.dsl.ScriptContext

/** `spark.ml` wrapper ETs (SURVEY.md §2.4; reference:
  * streamingpro-mlsql/src/main/java/streaming/dsl/mmlib/algs/SQL*.scala).
  *
  * Contract, same as the reference:
  *  - `train df as <Alg>.`/model/path` where <param>="v"` fits the
  *    estimator on `df` (expects `features` vector / `label` columns unless
  *    overridden by params), SAVES the model under the path, and returns a
  *    one-row status table.
  *  - `predict df as <Alg>.`/model/path`` loads the model and returns
  *    `model.transform(df)`.
  *  - `register <Alg>.`/model/path` as fn` builds a features→prediction
  *    UDF (reference: RegisterAdaptor.scala:61-79).
  *
  * Params are applied by NAME via the estimator's own `Param` objects, with
  * string values coerced by the param's concrete type (IntParam etc.) —
  * no per-algorithm option plumbing.
  *
  * Scale note: fitting is whatever `spark.ml` does (distributed); the
  * register-UDF path broadcasts the loaded model once per session.
  */
object MlETs {

  import org.apache.spark.ml.classification._
  import org.apache.spark.ml.clustering.{KMeans, KMeansModel, LDA, LDAModel, DistributedLDAModel, LocalLDAModel}
  import org.apache.spark.ml.feature._
  import org.apache.spark.ml.fpm.{FPGrowth, FPGrowthModel}
  import org.apache.spark.ml.recommendation.{ALS, ALSModel}
  import org.apache.spark.ml.regression._

  def all: Seq[ET] = Seq(
    new EstimatorET("NaiveBayes", () => new NaiveBayes(), p => NaiveBayesModel.load(p)),
    new EstimatorET("RandomForest", () => new RandomForestClassifier(), p => RandomForestClassificationModel.load(p)),
    new EstimatorET("GBTs", () => new GBTClassifier(), p => GBTClassificationModel.load(p)),
    new EstimatorET("GBTRegressor", () => new GBTRegressor(), p => GBTRegressionModel.load(p)),
    new EstimatorET("LSVM", () => new LinearSVC(), p => LinearSVCModel.load(p)),
    new EstimatorET("LogisticRegressor", () => new LogisticRegression(), p => LogisticRegressionModel.load(p)),
    new EstimatorET("LinearRegressionExt", () => new LinearRegression(), p => LinearRegressionModel.load(p)),
    new EstimatorET("KMeans", () => new KMeans(), p => KMeansModel.load(p)),
    new EstimatorET("LDA", () => new LDA(), p => loadLda(p)),
    new EstimatorET("ALS", () => new ALS(), p => ALSModel.load(p)),
    new EstimatorET("FPGrowth", () => new FPGrowth(), p => FPGrowthModel.load(p)),
    new EstimatorET("Word2vec", () => new Word2Vec(), p => Word2VecModel.load(p)),
    new EstimatorET("StandardScaler", () => new StandardScaler(), p => StandardScalerModel.load(p)),
    new EstimatorET("StringIndex", () => new StringIndexer(), p => StringIndexerModel.load(p)),
    new EstimatorET("Discretizer", () => new QuantileDiscretizer(), p => BucketizerLoader.load(p)),
    TfIdfInPlaceET, Word2VecInPlaceET, ScalerInPlaceET, NormalizeInPlaceET,
    ConfusionMatrixET, RowMatrixET, PageRankET)

  private def loadLda(p: String): Model[_] =
    try DistributedLDAModel.load(p) catch { case _: Throwable => LocalLDAModel.load(p) }

  private object BucketizerLoader {
    def load(p: String): Model[_] = Bucketizer.load(p)
  }

  /** Coerce "3"/"0.1"/"true"/"a,b" by the param's declared type. */
  private[ets] def applyParams(est: Params, params: Map[String, String]): Unit =
    params.foreach { case (k, v) =>
      if (est.hasParam(k)) {
        val p: Param[_] = est.getParam(k)
        val typed: Any = p match {
          case _: IntParam => v.toInt
          case _: LongParam => v.toLong
          case _: DoubleParam => v.toDouble
          case _: FloatParam => v.toFloat
          case _: BooleanParam => v.toBoolean
          case arr if arr.getClass.getSimpleName == "StringArrayParam" => v.split(",").map(_.trim)
          case arr if arr.getClass.getSimpleName == "DoubleArrayParam" => v.split(",").map(_.trim.toDouble)
          case arr if arr.getClass.getSimpleName == "IntArrayParam" => v.split(",").map(_.trim.toInt)
          case _ => v
        }
        est.set(p.asInstanceOf[Param[Any]], typed)
      }
    }

  private[ets] def statusTable(spark: SparkSession, kv: (String, String)*): DataFrame =
    UtilityETs.oneRowTable(spark, kv: _*)

  /** Generic estimator wrapper: fit+save on train, load+transform on
    * predict, features→prediction UDF on register.
    */
  final class EstimatorET(val name: String, mk: () => Estimator[_],
                          loader: String => Model[_]) extends ET {

    override def train(ctx: ScriptContext, df: DataFrame, path: String,
                       params: Map[String, String]): DataFrame = {
      val est = mk()
      applyParams(est, params)
      val model = est.fit(df).asInstanceOf[Model[_]]
      require(path.nonEmpty, s"$name: train requires a model path")
      model.asInstanceOf[MLWritable].write.overwrite().save(path)
      statusTable(ctx.spark, "alg" -> name, "path" -> path, "status" -> "trained")
    }

    override def batchPredict(ctx: ScriptContext, df: DataFrame, path: String,
                              params: Map[String, String]): DataFrame =
      loader(path).asInstanceOf[Model[_]].transform(df)

    override def load(spark: SparkSession, path: String, params: Map[String, String]): Any =
      loader(path)

    override def predict(spark: SparkSession, model: Any, udfName: String,
                         params: Map[String, String]): UserDefinedFunction = model match {
      case m: PredictionModel[_, _] =>
        val pm = m.asInstanceOf[PredictionModel[Vector, _]]
        udf((v: Vector) => pm.predict(v))
      case m: KMeansModel => udf((v: Vector) => m.predict(v))
      case other => throw new UnsupportedOperationException(
        s"$name (${other.getClass.getSimpleName}) has no scalar predict UDF; use `predict` for batch transform")
    }
  }

  /** TfIdfInPlace: text column → tfidf vector in one step (reference:
    * SQLTfIdfInPlace.scala via feature/StringFeature.scala:178): tokenize
    * (whitespace) → HashingTF → IDF; writes the IDF model under the path.
    */
  object TfIdfInPlaceET extends ET {
    override def name = "TfIdfInPlace"
    override def train(ctx: ScriptContext, df: DataFrame, path: String,
                       params: Map[String, String]): DataFrame = {
      val inputCol = params.getOrElse("inputCol", "text")
      val numFeatures = params.getOrElse("numFeatures", "262144").toInt
      val toks = new Tokenizer().setInputCol(inputCol).setOutputCol("__words__")
      val tf = new HashingTF().setInputCol("__words__").setOutputCol("__tf__")
        .setNumFeatures(numFeatures)
      val withTf = tf.transform(toks.transform(df))
      val idf = new IDF().setInputCol("__tf__").setOutputCol(inputCol + "_tfidf")
      val model = idf.fit(withTf)
      if (path.nonEmpty) model.write.overwrite().save(path)
      model.transform(withTf).drop("__words__", "__tf__")
    }
  }

  /** Word2VecInPlace: text column → averaged word-vector column. */
  object Word2VecInPlaceET extends ET {
    override def name = "Word2VecInPlace"
    override def train(ctx: ScriptContext, df: DataFrame, path: String,
                       params: Map[String, String]): DataFrame = {
      val inputCol = params.getOrElse("inputCol", "text")
      val toks = new Tokenizer().setInputCol(inputCol).setOutputCol("__words__")
      val w2v = new Word2Vec().setInputCol("__words__").setOutputCol(inputCol + "_w2v")
        .setVectorSize(params.getOrElse("vectorSize", "100").toInt)
        .setMinCount(params.getOrElse("minCount", "1").toInt)
        .setSeed(params.getOrElse("seed", "42").toLong)
      val model = w2v.fit(toks.transform(df))
      if (path.nonEmpty) model.write.overwrite().save(path)
      model.transform(toks.transform(df)).drop("__words__")
    }
  }

  /** ScalerInPlace: min-max scale a features vector column. */
  object ScalerInPlaceET extends ET {
    override def name = "ScalerInPlace"
    override def train(ctx: ScriptContext, df: DataFrame, path: String,
                       params: Map[String, String]): DataFrame = {
      val inputCol = params.getOrElse("inputCol", "features")
      val sc = new MinMaxScaler().setInputCol(inputCol).setOutputCol(inputCol + "_scaled")
      val model = sc.fit(df)
      if (path.nonEmpty) model.write.overwrite().save(path)
      model.transform(df)
    }
  }

  /** NormalizeInPlace: L^p normalize a features vector column. */
  object NormalizeInPlaceET extends ET {
    override def name = "NormalizeInPlace"
    override def train(ctx: ScriptContext, df: DataFrame, path: String,
                       params: Map[String, String]): DataFrame = {
      val inputCol = params.getOrElse("inputCol", "features")
      new Normalizer().setInputCol(inputCol).setOutputCol(inputCol + "_norm")
        .setP(params.getOrElse("p", "2.0").toDouble)
        .transform(df)
    }
  }

  /** ConfusionMatrix: actual/predicted columns → count matrix
    * (reference: SQLConfusionMatrix.scala:122 — groupBy + pivot).
    */
  object ConfusionMatrixET extends ET {
    override def name = "ConfusionMatrix"
    override def train(ctx: ScriptContext, df: DataFrame, path: String,
                       params: Map[String, String]): DataFrame = {
      val actual = params.getOrElse("actualCol", "actual")
      val predicted = params.getOrElse("predictCol", "predicted")
      df.groupBy(col(actual).cast("string").as(actual))
        .pivot(col(predicted).cast("string"))
        .agg(count(lit(1)))
        .na.fill(0)
        .orderBy(col(actual))
    }
  }

  /** RowMatrix: all-pairs column similarity over a vector column
    * (reference: SQLRowMatrix.scala → mllib RowMatrix.columnSimilarities).
    * `threshold` enables DIMSUM sampling — the scale path for wide data.
    */
  object RowMatrixET extends ET {
    override def name = "RowMatrix"
    override def train(ctx: ScriptContext, df: DataFrame, path: String,
                       params: Map[String, String]): DataFrame = {
      import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
      import org.apache.spark.mllib.linalg.distributed.RowMatrix
      val inputCol = params.getOrElse("inputCol", "features")
      val threshold = params.getOrElse("threshold", "0").toDouble
      val rows = df.select(inputCol).rdd.map(r =>
        OldVectors.fromML(r.getAs[Vector](0)))
      val sims = new RowMatrix(rows).columnSimilarities(threshold)
      import ctx.spark.implicits._
      sims.entries.map(e => (e.i, e.j, e.value)).toDF("i", "j", "sim")
    }
  }

  /** PageRank over an edge table (reference: SQLPageRank.scala → GraphX).
    * Expects `source`/`target` long columns (overridable).
    */
  object PageRankET extends ET {
    override def name = "PageRank"
    override def train(ctx: ScriptContext, df: DataFrame, path: String,
                       params: Map[String, String]): DataFrame = {
      import org.apache.spark.graphx.{Edge, Graph}
      val src = params.getOrElse("sourceCol", "source")
      val dst = params.getOrElse("targetCol", "target")
      val tol = params.getOrElse("tol", "0.001").toDouble
      val edges = df.select(col(src).cast("long"), col(dst).cast("long"))
        .rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1.0))
      val graph = Graph.fromEdges(edges, defaultValue = 1.0)
      val ranks = graph.pageRank(tol).vertices
      import ctx.spark.implicits._
      ranks.map { case (id, rank) => (id, rank) }.toDF("vertex", "pagerank")
    }
  }
}
