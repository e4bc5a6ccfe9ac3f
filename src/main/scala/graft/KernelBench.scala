package graft

/** Throwaway microbench for [[graft.plans.LshBandsKernel]] — dev tool,
  * no Spark session. `runMain graft.KernelBench [nPlanes] [bandBits]`. */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val np = args.headOption.map(_.toInt).getOrElse(144)
    val bb = if (args.length > 1) args(1).toInt else 24
    val rnd = new java.util.Random(42)
    val vec = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array.fill(64)(rnd.nextFloat().toDouble))
    (1 to 2000).foreach(_ => graft.plans.LshBandsKernel.compute(vec, np, bb))
    val n = 20000
    val t0 = System.nanoTime()
    (1 to n).foreach(_ => graft.plans.LshBandsKernel.compute(vec, np, bb))
    val perRow = (System.nanoTime() - t0) / 1e3 / n
    println(f"[kbench] lsh_bands($np,$bb): $perRow%.1f us/row -> " +
      f"${perRow * 600000 / 1e6 / 32}%.1f s per 600k-row pass on 32 cores")
  }
}
