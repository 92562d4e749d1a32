package arcanespark.dv;

import java.io.IOException;
import java.nio.ByteBuffer;
import java.nio.ByteOrder;
import java.util.Arrays;

import org.apache.spark.sql.Row;
import org.apache.spark.sql.RowFactory;
import org.apache.spark.sql.api.java.UDF2;

import scala.collection.Iterator;
import scala.collection.Seq;

/**
 * Deletion-vector BUILD in the JVM (r12): the executor-side twin of
 * {@code delta_dv.serialize_positions} + the per-file union step of
 * {@code delete_where}'s bitmap builder, removing the grouped-pandas
 * Python round trip from the DV write path (optimization guide
 * section 4). Byte-IDENTITY with the Python writer is part of the
 * contract (DV file names are content-derived md5 UUIDs): the writer
 * always emits the simplest legal portable form — cookie 12346, no run
 * containers, offsets present, array containers at cardinality <= 4096
 * and 8 KiB bitmap containers above, one 32-bit bitmap per 64-bit high
 * key up to the max key (empty bitmaps included) — exactly the Python
 * codec's layout, pinned byte-for-byte in tests/test_dv_diff_jvm.py.
 *
 * <p>Input: the file's OLD deletion-vector spec (same driver-resolved
 * format as {@link DvDiffUdf}: null / {@code F|off|size|path} /
 * {@code I|base64}) and the newly deleted positions (any order,
 * duplicates tolerated — sorted and deduplicated here, the np.unique
 * semantics). Output row: (data BINARY, cardinality BIGINT) where data
 * is the serialized RoaringBitmapArray of old ∪ new.
 */
public final class DvBuildUdf implements UDF2<String, Seq<Long>, Row> {

  private static final int MAGIC = 1681511377;
  private static final int COOKIE_NO_RUN = 12346;
  private static final int ARRAY_MAX = 4096;

  @Override
  public Row call(String oldSpec, Seq<Long> newPositions) throws IOException {
    long[] fresh = new long[newPositions.size()];
    Iterator<Long> it = newPositions.iterator();
    int n = 0;
    while (it.hasNext()) {
      fresh[n++] = it.next();
    }
    long[] old = DvDiffUdf.readSpec(oldSpec);
    long[] merged = new long[fresh.length + old.length];
    System.arraycopy(fresh, 0, merged, 0, fresh.length);
    System.arraycopy(old, 0, merged, fresh.length, old.length);
    Arrays.sort(merged);
    int uniq = 0;
    for (int i = 0; i < merged.length; i++) {
      if (uniq == 0 || merged[i] != merged[uniq - 1]) {
        merged[uniq++] = merged[i];
      }
    }
    long[] pos = Arrays.copyOf(merged, uniq);
    return RowFactory.create(serializePositions(pos), (long) uniq);
  }

  /** int64 positions (SORTED UNIQUE) -> Delta's portable RoaringBitmapArray. */
  static byte[] serializePositions(long[] pos) {
    if (pos.length > 0 && (pos[0] < 0 || (pos[pos.length - 1] >>> 32) > 0x7FFFFFFFL)) {
      throw new IllegalArgumentException("position exceeds the DV domain");
    }
    // split by high-32 key; every key up to the max is present
    int nMaps = pos.length == 0 ? 0 : (int) (pos[pos.length - 1] >>> 32) + 1;
    java.io.ByteArrayOutputStream out = new java.io.ByteArrayOutputStream();
    writeIntLe(out, MAGIC);
    writeLongLe(out, nMaps);
    int at = 0;
    for (int k = 0; k < nMaps; k++) {
      int end = at;
      while (end < pos.length && (pos[end] >>> 32) == k) {
        end++;
      }
      int[] lows = new int[end - at];
      for (int i = at; i < end; i++) {
        lows[i - at] = (int) pos[i]; // low 32 bits, still sorted
      }
      serializeRb32(out, lows);
      at = end;
    }
    return out.toByteArray();
  }

  /** SORTED UNIQUE uint32 values -> portable 32-bit RoaringBitmap bytes. */
  private static void serializeRb32(java.io.ByteArrayOutputStream out, int[] values) {
    // container bounds by high-16 key
    int n = 0;
    for (int i = 0; i < values.length; i++) {
      if (i == 0 || (values[i] >>> 16) != (values[i - 1] >>> 16)) {
        n++;
      }
    }
    int[] keys = new int[n];
    int[] starts = new int[n + 1];
    int c = 0;
    for (int i = 0; i < values.length; i++) {
      if (i == 0 || (values[i] >>> 16) != (values[i - 1] >>> 16)) {
        keys[c] = values[i] >>> 16;
        starts[c] = i;
        c++;
      }
    }
    starts[n] = values.length;
    writeIntLe(out, COOKIE_NO_RUN);
    writeIntLe(out, n);
    for (int i = 0; i < n; i++) {
      writeShortLe(out, keys[i]);
      writeShortLe(out, starts[i + 1] - starts[i] - 1);
    }
    // offsets: byte position of each payload from the rb32 stream start
    int posAt = 4 + 4 + 4 * n + 4 * n;
    for (int i = 0; i < n; i++) {
      writeIntLe(out, posAt);
      int card = starts[i + 1] - starts[i];
      posAt += card <= ARRAY_MAX ? 2 * card : 8192;
    }
    for (int i = 0; i < n; i++) {
      int card = starts[i + 1] - starts[i];
      if (card <= ARRAY_MAX) {
        for (int j = starts[i]; j < starts[i + 1]; j++) {
          writeShortLe(out, values[j] & 0xFFFF);
        }
      } else {
        long[] bits = new long[1024];
        for (int j = starts[i]; j < starts[i + 1]; j++) {
          int lo = values[j] & 0xFFFF;
          bits[lo >>> 6] |= 1L << (lo & 63);
        }
        ByteBuffer bb = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN);
        for (long w : bits) {
          bb.putLong(w);
        }
        out.write(bb.array(), 0, 8192);
      }
    }
  }

  private static void writeIntLe(java.io.ByteArrayOutputStream out, int v) {
    out.write(v & 0xFF);
    out.write((v >>> 8) & 0xFF);
    out.write((v >>> 16) & 0xFF);
    out.write((v >>> 24) & 0xFF);
  }

  private static void writeLongLe(java.io.ByteArrayOutputStream out, long v) {
    writeIntLe(out, (int) v);
    writeIntLe(out, (int) (v >>> 32));
  }

  private static void writeShortLe(java.io.ByteArrayOutputStream out, int v) {
    out.write(v & 0xFF);
    out.write((v >>> 8) & 0xFF);
  }
}
