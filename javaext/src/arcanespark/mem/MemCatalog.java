package arcanespark.mem;

import java.io.IOException;
import java.io.Serializable;
import java.util.ArrayList;
import java.util.Arrays;
import java.util.List;
import java.util.Map;
import java.util.Set;
import java.util.concurrent.ConcurrentHashMap;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException;
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException;
import org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException;
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow;
import org.apache.spark.sql.connector.catalog.Identifier;
import org.apache.spark.sql.connector.catalog.SupportsNamespaces;
import org.apache.spark.sql.connector.catalog.SupportsRead;
import org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations;
import org.apache.spark.sql.connector.catalog.SupportsWrite;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCapability;
import org.apache.spark.sql.connector.catalog.TableCatalog;
import org.apache.spark.sql.connector.catalog.TableChange;
import org.apache.spark.sql.connector.expressions.Transform;
import org.apache.spark.sql.connector.read.Batch;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReader;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.write.BatchWrite;
import org.apache.spark.sql.connector.write.DataWriter;
import org.apache.spark.sql.connector.write.DataWriterFactory;
import org.apache.spark.sql.connector.write.LogicalWriteInfo;
import org.apache.spark.sql.connector.write.PhysicalWriteInfo;
import org.apache.spark.sql.connector.write.RowLevelOperation;
import org.apache.spark.sql.connector.write.RowLevelOperationBuilder;
import org.apache.spark.sql.connector.write.RowLevelOperationInfo;
import org.apache.spark.sql.connector.write.SupportsTruncate;
import org.apache.spark.sql.connector.write.Write;
import org.apache.spark.sql.connector.write.WriteBuilder;
import org.apache.spark.sql.connector.write.WriterCommitMessage;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

/**
 * Minimal in-memory DSv2 catalog whose tables accept MERGE INTO through the
 * group-based row-level-operation API (SupportsRowLevelOperations), the same
 * connector surface Iceberg's copy-on-write mode uses. Exists so the engine's
 * generated MERGE SQL executes end-to-end in a jar-less sandbox; the row store
 * is a JVM-local static map, which is exactly right for local[*] testing and
 * deliberately nothing more.
 */
public class MemCatalog implements TableCatalog, SupportsNamespaces {

  /** table-key -> store; static because executors share the local JVM. */
  static final Map<String, Store> STORES = new ConcurrentHashMap<>();

  static final class Store {
    volatile StructType schema;
    final List<InternalRow> rows = new ArrayList<>();
    final Map<String, String> properties = new ConcurrentHashMap<>();
    Store(StructType schema) { this.schema = schema; }
  }

  private String name = "mem";

  @Override public void initialize(String name, CaseInsensitiveStringMap options) {
    this.name = name;
  }

  @Override public String name() { return name; }

  private String key(Identifier ident) {
    return name + "|" + String.join("|", ident.namespace())
        + "|" + ident.name();
  }

  @Override public Identifier[] listTables(String[] namespace) {
    List<Identifier> out = new ArrayList<>();
    String prefix = name + "|" + String.join("|", namespace) + "|";
    for (String k : STORES.keySet()) {
      if (k.startsWith(prefix)) {
        String rest = k.substring(prefix.length());
        if (!rest.contains("|")) out.add(Identifier.of(namespace, rest));
      }
    }
    return out.toArray(new Identifier[0]);
  }

  @Override public Table loadTable(Identifier ident) throws NoSuchTableException {
    Store s = STORES.get(key(ident));
    if (s == null) throw new NoSuchTableException(ident);
    return new MemTable(key(ident), ident.name(), s);
  }

  @Override public Table createTable(
      Identifier ident, StructType schema, Transform[] partitions,
      Map<String, String> properties) throws TableAlreadyExistsException {
    String k = key(ident);
    // atomic claim: concurrent DDL racing containsKey/put could silently
    // clobber an existing table's Store
    Store fresh = new Store(schema);
    if (STORES.putIfAbsent(k, fresh) != null) {
      throw new TableAlreadyExistsException(ident);
    }
    return new MemTable(k, ident.name(), fresh);
  }

  @Override public Table alterTable(Identifier ident, TableChange... changes)
      throws NoSuchTableException {
    Store s = STORES.get(key(ident));
    if (s == null) throw new NoSuchTableException(ident);
    synchronized (s.rows) {
      for (TableChange change : changes) {
        if (change instanceof TableChange.AddColumn) {
          TableChange.AddColumn add = (TableChange.AddColumn) change;
          if (add.fieldNames().length != 1) {
            throw new UnsupportedOperationException("nested add column");
          }
          StructType old = s.schema;
          s.schema = s.schema.add(
              new StructField(add.fieldNames()[0], add.dataType(),
                  add.isNullable(), org.apache.spark.sql.types.Metadata.empty()));
          // pad existing rows with null for the new column
          List<InternalRow> padded = new ArrayList<>(s.rows.size());
          for (InternalRow r : s.rows) {
            Object[] vals = new Object[s.schema.size()];
            for (int i = 0; i < old.size(); i++) {
              vals[i] = r.isNullAt(i) ? null : r.get(i, old.fields()[i].dataType());
            }
            padded.add(new GenericInternalRow(vals));
          }
          s.rows.clear();
          s.rows.addAll(padded);
        } else if (change instanceof TableChange.SetProperty) {
          TableChange.SetProperty set = (TableChange.SetProperty) change;
          s.properties.put(set.property(), set.value());
        } else if (change instanceof TableChange.RemoveProperty) {
          s.properties.remove(((TableChange.RemoveProperty) change).property());
        } else {
          throw new UnsupportedOperationException("alter: " + change);
        }
      }
    }
    return new MemTable(key(ident), ident.name(), s);
  }

  @Override public boolean dropTable(Identifier ident) {
    return STORES.remove(key(ident)) != null;
  }

  @Override public void renameTable(Identifier oldIdent, Identifier newIdent)
      throws NoSuchTableException, TableAlreadyExistsException {
    // single-lock rename: the get/put/remove sequence is not atomic on its
    // own, so concurrent renames/creates could orphan or clobber a Store
    synchronized (STORES) {
      Store s = STORES.get(key(oldIdent));
      if (s == null) throw new NoSuchTableException(oldIdent);
      if (STORES.putIfAbsent(key(newIdent), s) != null) {
        throw new TableAlreadyExistsException(newIdent);
      }
      STORES.remove(key(oldIdent));
    }
  }

  // -- SupportsNamespaces: every single-level namespace implicitly exists --

  @Override public String[][] listNamespaces() {
    return new String[][] { new String[] { "default" } };
  }

  @Override public String[][] listNamespaces(String[] namespace)
      throws NoSuchNamespaceException {
    return new String[0][];
  }

  @Override public Map<String, String> loadNamespaceMetadata(String[] namespace)
      throws NoSuchNamespaceException {
    return java.util.Collections.emptyMap();
  }

  @Override public boolean namespaceExists(String[] namespace) {
    return namespace.length <= 1;
  }

  @Override public void createNamespace(String[] namespace, Map<String, String> metadata) {}

  @Override public void alterNamespace(String[] namespace,
      org.apache.spark.sql.connector.catalog.NamespaceChange... changes) {
    throw new UnsupportedOperationException("alterNamespace");
  }

  @Override public boolean dropNamespace(String[] namespace, boolean cascade) {
    return false;
  }

  // ------------------------------------------------------------------
  // Table
  // ------------------------------------------------------------------

  static final class MemTable implements SupportsRead, SupportsWrite,
      SupportsRowLevelOperations {
    private final String storeKey;
    private final String tableName;
    private final Store store;

    MemTable(String storeKey, String tableName, Store store) {
      this.storeKey = storeKey;
      this.tableName = tableName;
      this.store = store;
    }

    @Override public String name() { return tableName; }

    @Override public Map<String, String> properties() { return store.properties; }

    @Override @SuppressWarnings("deprecation")
    public StructType schema() { return store.schema; }

    @Override public Set<TableCapability> capabilities() {
      return Set.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
          TableCapability.TRUNCATE);
    }

    @Override public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
      return new MemScanBuilder(storeKey, store.schema);
    }

    @Override public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
      return new MemWriteBuilder(storeKey, false, info.schema());
    }

    @Override public RowLevelOperationBuilder newRowLevelOperationBuilder(
        RowLevelOperationInfo info) {
      return () -> new MemRowLevelOperation(storeKey, store.schema, info.command());
    }
  }

  // ------------------------------------------------------------------
  // Read path: one partition over a snapshot of the store
  // ------------------------------------------------------------------

  static final class MemScanBuilder implements ScanBuilder, Scan, Batch {
    private final String storeKey;
    private final StructType schema;

    MemScanBuilder(String storeKey, StructType schema) {
      this.storeKey = storeKey;
      this.schema = schema;
    }

    @Override public Scan build() { return this; }
    @Override public StructType readSchema() { return schema; }
    @Override public Batch toBatch() { return this; }
    @Override public String description() { return "mem-scan:" + storeKey; }

    @Override public InputPartition[] planInputPartitions() {
      Store s = STORES.get(storeKey);
      final InternalRow[] snapshot;
      synchronized (s.rows) {
        snapshot = s.rows.toArray(new InternalRow[0]);
      }
      return new InputPartition[] { new MemInputPartition(snapshot) };
    }

    @Override public PartitionReaderFactory createReaderFactory() {
      return new MemReaderFactory();
    }
  }

  /** Carries the row snapshot itself: planInputPartitions runs on the
   * driver (where the canonical STORES lives), while the reader may run
   * under a different classloader (ADD JAR at runtime duplicates this
   * class per loader, each with its own static map). Embedding the data
   * sidesteps static-state split-brain entirely. */
  static final class MemInputPartition implements InputPartition, Serializable {
    final InternalRow[] snapshot;
    MemInputPartition(InternalRow[] snapshot) { this.snapshot = snapshot; }
  }

  static final class MemReaderFactory implements PartitionReaderFactory {
    @Override public PartitionReader<InternalRow> createReader(InputPartition p) {
      final InternalRow[] snapshot = ((MemInputPartition) p).snapshot;
      return new PartitionReader<InternalRow>() {
        private int i = -1;
        @Override public boolean next() { return ++i < snapshot.length; }
        @Override public InternalRow get() { return snapshot[i]; }
        @Override public void close() {}
      };
    }
  }

  // ------------------------------------------------------------------
  // Write path: writers collect copies, commit applies them atomically
  // ------------------------------------------------------------------

  static final class MemWriteBuilder implements WriteBuilder, SupportsTruncate {
    private final String storeKey;
    private boolean replaceAll;
    private final StructType writeSchema;

    MemWriteBuilder(String storeKey, boolean replaceAll, StructType writeSchema) {
      this.storeKey = storeKey;
      this.replaceAll = replaceAll;
      this.writeSchema = writeSchema;
    }

    @Override public WriteBuilder truncate() {
      this.replaceAll = true;
      return this;
    }

    @Override public Write build() {
      final String k = storeKey;
      final boolean replace = replaceAll;
      final StructType ws = writeSchema;
      return new Write() {
        @Override public BatchWrite toBatch() {
          return new MemBatchWrite(k, replace, ws);
        }
        @Override public String description() { return "mem-write:" + k; }
      };
    }
  }

  static final class MemBatchWrite implements BatchWrite {
    private final String storeKey;
    private final boolean replaceAll;
    private final StructType writeSchema;

    MemBatchWrite(String storeKey, boolean replaceAll, StructType writeSchema) {
      this.storeKey = storeKey;
      this.replaceAll = replaceAll;
      this.writeSchema = writeSchema;
    }

    @Override public DataWriterFactory createBatchWriterFactory(PhysicalWriteInfo info) {
      // rows arrive laid out for the WRITE schema (MERGE/ReplaceData may
      // order or subset columns differently from the table); normalize to
      // table-schema order by field name before storing
      StructType tableSchema = STORES.get(storeKey).schema;
      return new MemWriterFactory(writeSchema, tableSchema);
    }

    @Override public void commit(WriterCommitMessage[] messages) {
      Store s = STORES.get(storeKey);
      List<InternalRow> incoming = new ArrayList<>();
      for (WriterCommitMessage m : messages) {
        if (m == null) continue;
        // the message may have been deserialized under a different
        // classloader than this class (ADD JAR at runtime) -- a cast
        // would throw, so read the rows field reflectively
        try {
          java.lang.reflect.Field f = m.getClass().getDeclaredField("rows");
          f.setAccessible(true);
          @SuppressWarnings("unchecked")
          List<InternalRow> rows = (List<InternalRow>) f.get(m);
          incoming.addAll(rows);
        } catch (ReflectiveOperationException e) {
          throw new IllegalStateException("unexpected commit message: " + m, e);
        }
      }
      synchronized (s.rows) {
        if (replaceAll) s.rows.clear();
        s.rows.addAll(incoming);
      }
    }

    @Override public void abort(WriterCommitMessage[] messages) {}
  }

  static final class MemWriterFactory implements DataWriterFactory {
    private final StructType writeSchema;
    private final StructType tableSchema;

    MemWriterFactory(StructType writeSchema, StructType tableSchema) {
      this.writeSchema = writeSchema;
      this.tableSchema = tableSchema;
    }

    @Override public DataWriter<InternalRow> createWriter(int partitionId, long taskId) {
      // table-column index -> write-row index (or -1 -> null)
      final int[] srcIdx = new int[tableSchema.size()];
      final DataType[] srcType = new DataType[tableSchema.size()];
      for (int t = 0; t < tableSchema.size(); t++) {
        srcIdx[t] = -1;
        for (int w = 0; w < writeSchema.size(); w++) {
          if (writeSchema.fields()[w].name()
              .equalsIgnoreCase(tableSchema.fields()[t].name())) {
            srcIdx[t] = w;
            srcType[t] = writeSchema.fields()[w].dataType();
            break;
          }
        }
      }
      return new DataWriter<InternalRow>() {
        private final List<InternalRow> rows = new ArrayList<>();
        private boolean layoutChecked = false;

        /** Best-effort guard against the tail-slot assumption going stale:
         * every declared write column must be readable with its declared
         * type at the tail alignment. InternalRow carries no runtime type
         * info, so a misalignment cannot always be proven, but mismatched
         * variable-length reads (strings/decimals against fixed slots)
         * throw or return garbage offsets here rather than silently
         * scrambling stored values on a future Spark layout change. */
        private void checkLayout(InternalRow r, int off) {
          for (int w = 0; w < writeSchema.size(); w++) {
            try {
              if (!r.isNullAt(off + w)) {
                Object v = r.get(off + w, writeSchema.fields()[w].dataType());
                if (v instanceof org.apache.spark.unsafe.types.UTF8String
                    && ((org.apache.spark.unsafe.types.UTF8String) v).numBytes() < 0) {
                  throw new IllegalStateException("negative string length");
                }
              }
            } catch (RuntimeException e) {
              throw new IllegalStateException(
                  "ReplaceData row layout mismatch: write column '"
                  + writeSchema.fields()[w].name() + "' is not readable as "
                  + writeSchema.fields()[w].dataType().simpleString()
                  + " at tail slot " + (off + w) + " (row width "
                  + r.numFields() + ", declared write width "
                  + writeSchema.size() + "). The extra plan columns are "
                  + "assumed to be LEADING; a Spark upgrade may have "
                  + "changed this.", e);
            }
          }
        }

        @Override public void write(InternalRow record) {
          InternalRow r = record.copy();
          // group-based ReplaceData rows can carry extra leading plan
          // columns beyond LogicalWriteInfo.schema() (observed: one in
          // Spark 4.1); the declared write columns occupy the TAIL slots
          int off = r.numFields() - writeSchema.size();
          if (off < 0) {
            throw new IllegalStateException(
                "row narrower than write schema: " + r.numFields()
                + " < " + writeSchema.size());
          }
          if (off > 0 && !layoutChecked) {
            checkLayout(r, off);
            layoutChecked = true;
          }
          Object[] vals = new Object[srcIdx.length];
          for (int t = 0; t < srcIdx.length; t++) {
            int w = srcIdx[t];
            vals[t] = (w < 0 || r.isNullAt(off + w)) ? null
                : r.get(off + w, srcType[t]);
          }
          rows.add(new GenericInternalRow(vals));
        }
        @Override public WriterCommitMessage commit() {
          return new MemCommitMessage(rows);
        }
        @Override public void abort() { rows.clear(); }
        @Override public void close() throws IOException {}
      };
    }
  }

  public static final class MemCommitMessage implements WriterCommitMessage {
    public final List<InternalRow> rows;
    MemCommitMessage(List<InternalRow> rows) { this.rows = rows; }
  }

  // ------------------------------------------------------------------
  // Group-based row-level operation: scan everything, replace everything.
  // (One group = the whole table; Iceberg prunes groups to matching files,
  // the semantics are identical.)
  // ------------------------------------------------------------------

  static final class MemRowLevelOperation implements RowLevelOperation {
    private final String storeKey;
    private final StructType schema;
    private final Command command;

    MemRowLevelOperation(String storeKey, StructType schema, Command command) {
      this.storeKey = storeKey;
      this.schema = schema;
      this.command = command;
    }

    @Override public Command command() { return command; }

    @Override public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
      return new MemScanBuilder(storeKey, schema);
    }

    @Override public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
      return new MemWriteBuilder(storeKey, true, info.schema());
    }
  }
}
