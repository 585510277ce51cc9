package graft.tools

import graft.bench.Calibration

/**
 * Standalone window-quality probe — run BEFORE a bench or scaling pair to
 * decide whether the measurement is admissible (BENCH.md methodology): the
 * pure-CPU ratio alone is NOT sufficient (it is register-only and blind to
 * DRAM tenancy — measured: a clean 3.7–4.0× CPU bracket around a 0.35-raw
 * scaling run whose task-CPU inflated 2.8×); the memory-streaming ratio is
 * the admissibility test. No SparkSession needed.
 *
 * Usage: runMain graft.tools.CalibProbe [lo] [hi]   (default 8 32)
 */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val lo = args.headOption.map(_.toInt).getOrElse(8)
    val hi = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val ideal = hi.toDouble / lo
    val steal = Calibration.stealPct()
    val (_, opsHi, cpuR) = Calibration.cpuRatio(lo, hi)
    val (_, gbpsHi, memR) = Calibration.memRatio(lo, hi)
    val (_, rpsHi, randR) = Calibration.randRatio(lo, hi)
    println(f"[calib] cpus=$lo->$hi steal=$steal%.2f%%")
    println(f"[calib] cpu_ratio=$cpuR%.2f (eff ${cpuR / ideal}%.2f) mops_per_thread=${opsHi / hi / 1e6}%.0f")
    println(f"[calib] mem_ratio=$memR%.2f (eff ${memR / ideal}%.2f) mem_gbps_hi=${gbpsHi / 1e9}%.1f")
    println(f"[calib] rand_ratio=$randR%.2f (eff ${randR / ideal}%.2f) rand_mreads_hi=${rpsHi / 1e6}%.0f")
    val admissible = cpuR / ideal >= 0.85 && memR / ideal >= 0.7
    println(s"[calib] window_admissible=$admissible")
  }
}
