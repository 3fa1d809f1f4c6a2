package graft.connectors

import org.apache.spark.sql.{Dataset, Encoder}

/** Rate-limited per-row side-effecting map (SURVEY §2.10 U8 — the 1 rps
  * geocoder, utils/georeference/tasks.py:94-137).
  *
  * The frame is coalesced to `parallelism` partitions; each partition
  * paces its own calls so the GLOBAL rate is parallelism × perPartitionRps.
  * For a 1 rps external API use parallelism = 1 — honest about the
  * bottleneck instead of hiding it in executor retries.
  */
object RateLimited {

  def mapRateLimited[T, U: Encoder](ds: Dataset[T], perPartitionRps: Double,
                                    parallelism: Int = 1)(f: T => U): Dataset[U] = {
    val intervalNanos = (1e9 / perPartitionRps).toLong
    ds.coalesce(parallelism).mapPartitions { it =>
      var next = System.nanoTime()
      it.map { t =>
        val now = System.nanoTime()
        if (now < next) {
          val ms = (next - now) / 1000000
          Thread.sleep(ms, ((next - now) % 1000000).toInt)
        }
        next = math.max(now, next) + intervalNanos
        f(t)
      }
    }
  }
}
