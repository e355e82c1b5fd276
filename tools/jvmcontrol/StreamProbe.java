// No-Spark JVM host-ceiling control for the join workloads' traffic
// profile: stream a long range, do the pip_join packing arithmetic,
// probe a small open-addressed long hash table (LongHashedRelation
// stand-in), and count survivors.  Run with T threads, each processing
// a fixed per-thread unit, print per-unit wall seconds.  Comparing T vs
// 4T bounds what ANY JVM streaming+probe workload can scale on this
// host - the pure-ALU spin and the numpy-kernel controls have different
// traffic profiles and different ceilings.
//
// Usage: java StreamProbe <threads> <rowsPerThread>
import java.util.concurrent.*;

public class StreamProbe {
    static final int TABLE_BITS = 16;               // 64k-slot table, cache-resident like the broadcast map
    static final int MASK = (1 << TABLE_BITS) - 1;
    static long[] keys = new long[1 << TABLE_BITS];
    static long[] vals = new long[1 << TABLE_BITS];

    static void build() {
        java.util.Arrays.fill(keys, -1L);
        java.util.Random r = new java.util.Random(42);
        for (int i = 0; i < 40_000; i++) {          // ~same occupancy as the bench broadcast
            long k = (r.nextInt(1 << 21)) * (1L << 22) + r.nextInt(1 << 21);
            int h = (int) ((k * 0x9E3779B97F4A7C15L) >>> (64 - TABLE_BITS));
            while (keys[h] != -1L && keys[h] != k) h = (h + 1) & MASK;
            keys[h] = k; vals[h] = k ^ 0x5DEECE66DL;
        }
    }

    static long unit(long start, long n) {
        long acc = 0;
        for (long i = start; i < start + n; i++) {
            long px = (i * 2654435761L) % 880000L;          // derived-point arithmetic
            long py = (i * 7919L) % 880000L;
            long tx = px / 6880, ty = py / 6880;            // tile math
            long k = (tx + (1L << 21)) * (1L << 22) + (ty + (1L << 21));
            int h = (int) ((k * 0x9E3779B97F4A7C15L) >>> (64 - TABLE_BITS));
            while (keys[h] != -1L) {                        // probe
                if (keys[h] == k) { acc += vals[h] ^ i; break; }
                h = (h + 1) & MASK;
            }
        }
        return acc;
    }

    public static void main(String[] args) throws Exception {
        int threads = Integer.parseInt(args[0]);
        long rows = Long.parseLong(args[1]);
        build();
        ExecutorService ex = Executors.newFixedThreadPool(threads);
        // warm: JIT + page-in
        runAll(ex, threads, rows);
        long t0 = System.nanoTime();
        runAll(ex, threads, rows);
        double dt = (System.nanoTime() - t0) / 1e9;
        ex.shutdown();
        System.out.println("PERUNIT " + dt);
    }

    static void runAll(ExecutorService ex, int threads, long rows) throws Exception {
        Future<?>[] fs = new Future<?>[threads];
        for (int t = 0; t < threads; t++) {
            final long s = t * rows;
            fs[t] = ex.submit(() -> unit(s, rows));
        }
        for (Future<?> f : fs) f.get();
    }
}
