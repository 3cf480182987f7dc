package graft.pipeline

import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature._
import org.apache.spark.sql.DataFrame

/** ML pipeline builders (SURVEY §2.13): the sklearn Transformer/
  * Pipeline protocol re-expressed as `org.apache.spark.ml` stages.
  *
  * Reference: `build_data_preprocessor` (gofast/utils/ml/
  * preprocessing.py:2570), `make_pipe` (:2338), `soft_imputer` (:2762),
  * `apply_tfidf_vectorization` (dataops/preprocessing.py:3195),
  * `apply_word_embeddings` (:3285), `KMeansFeaturizer`
  * (transformers/feature_engineering.py:1373).
  */
object Stages {

  /** Numeric+categorical preprocessor: impute → index → one-hot →
    * assemble → standardize, ending in a `features` vector column. */
  def preprocessor(numCols: Seq[String], catCols: Seq[String],
                   imputeStrategy: String = "mean"): Pipeline = {
    val imputed = numCols.map(c => s"${c}_imp")
    val imputer = new Imputer().setStrategy(imputeStrategy)
      .setInputCols(numCols.toArray).setOutputCols(imputed.toArray)
    val indexers = catCols.map(c => new StringIndexer()
      .setInputCol(c).setOutputCol(s"${c}_idx")
      .setStringOrderType("alphabetAsc").setHandleInvalid("keep"))
    val encoder = new OneHotEncoder()
      .setInputCols(catCols.map(c => s"${c}_idx").toArray)
      .setOutputCols(catCols.map(c => s"${c}_oh").toArray)
    val assembler = new VectorAssembler()
      .setInputCols((imputed ++ catCols.map(c => s"${c}_oh")).toArray)
      .setOutputCol("features_raw")
    val scaler = new StandardScaler().setWithMean(true)
      .setInputCol("features_raw").setOutputCol("features")
    new Pipeline().setStages(
      (Seq(imputer) ++ indexers ++ Seq(encoder, assembler, scaler)).toArray)
  }

  /** Tokenize → HashingTF → IDF (`apply_tfidf_vectorization`). */
  def tfidf(textCol: String, outCol: String = "tfidf",
            numFeatures: Int = 1 << 18): Pipeline = {
    val tok = new RegexTokenizer().setInputCol(textCol).setOutputCol("_toks")
      .setPattern("\\s+")
    val tf = new HashingTF().setInputCol("_toks").setOutputCol("_tf")
      .setNumFeatures(numFeatures)
    val idf = new IDF().setInputCol("_tf").setOutputCol(outCol)
    new Pipeline().setStages(Array(tok, tf, idf))
  }

  /** Tokenize → Word2Vec mean embedding (`apply_word_embeddings`). */
  def word2vec(textCol: String, outCol: String = "w2v", dim: Int = 32,
               seed: Long = 42L): Pipeline = {
    val tok = new RegexTokenizer().setInputCol(textCol).setOutputCol("_toks")
      .setPattern("\\s+")
    val w2v = new Word2Vec().setInputCol("_toks").setOutputCol(outCol)
      .setVectorSize(dim).setMinCount(1).setSeed(seed)
    new Pipeline().setStages(Array(tok, w2v))
  }

  /** Cluster-id-as-feature (`KMeansFeaturizer`): assemble numeric cols,
    * fit KMeans, emit the cluster index column. */
  def kmeansFeaturizer(numCols: Seq[String], k: Int,
                       outCol: String = "cluster", seed: Long = 42L): Pipeline = {
    val assembler = new VectorAssembler().setInputCols(numCols.toArray)
      .setOutputCol("_kmf")
    val km = new KMeans().setK(k).setSeed(seed).setFeaturesCol("_kmf")
      .setPredictionCol(outCol)
    new Pipeline().setStages(Array(assembler, km))
  }

  /** PCA reduction over assembled numeric columns
    * (`select_and_reduce_features`, ts_utils.py:4304). */
  def pca(numCols: Seq[String], k: Int, outCol: String = "pca"): Pipeline = {
    val assembler = new VectorAssembler().setInputCols(numCols.toArray)
      .setOutputCol("_pca_in")
    val p = new PCA().setK(k).setInputCol("_pca_in").setOutputCol(outCol)
    new Pipeline().setStages(Array(assembler, p))
  }

  /** Gradient-boosted trees regressor pipeline
    * (`gradient_boosting_regressor`, gofast/utils/mathext.py:5135). */
  def gbtRegressor(numCols: Seq[String], labelCol: String,
                   maxIter: Int = 10, seed: Long = 42L): Pipeline = {
    val assembler = new VectorAssembler().setInputCols(numCols.toArray)
      .setOutputCol("_gbt_in")
    val gbt = new org.apache.spark.ml.regression.GBTRegressor()
      .setFeaturesCol("_gbt_in").setLabelCol(labelCol)
      .setMaxIter(maxIter).setSeed(seed)
    new Pipeline().setStages(Array(assembler, gbt))
  }

  /** Equal-frequency discretizer (`to_categories(method='quantile')`,
    * data_utils.py:5927). */
  def quantileBinner(col: String, bins: Int, outCol: String): QuantileDiscretizer =
    new QuantileDiscretizer().setInputCol(col).setOutputCol(outCol)
      .setNumBuckets(bins)
}
