"""Tool-output document semantics (P17 scancode, P19 reuse) — the
relational meaning the crawler extracts FROM tool results, modeled over
synthetic result tables shaped like the reference's golden fixtures
(test/fixtures/scancode/32.1.0/*.json, fsfeReuse/0.15.0/*).

The tool binaries are not run (sandbox); what IS modeled, exactly:

* scancode: which result files become attachments
  (providers/process/scancode.js:68-90 — is_license_text files plus
  package_data manifests, with the directory manifest_path join rule)
  and the real-vs-benign scan_errors triage (scancode.js:99-117).
* reuse: the SPDX report parse (providers/process/fsfeReuse.js:85-138 —
  blank-line sections, first section = metadata, `Key: [Secondary: ]
  value` attribute lines with tag stripping, FileName './' and
  FileCopyrightText prefix fixups) and the LICENSES dir listing with its
  `indexOf('.txt')` spdxId quirk (fsfeReuse.js:140-156).

All pure column expressions / explodes — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# scancode.js:104-109 — scan_errors matching any of these are benign
_BENIGN_ERROR_PATTERNS = (
    "ERROR: Processing interrupted: timeout after",
    "ValueError:",
    "package.json",
    "UnicodeDecodeError",
)


def scancode_attachment_paths(files: DataFrame) -> DataFrame:
    """Attachment paths from a scancode result-file table
    (scancode.js:68-90). Input columns: doc, path, ftype,
    is_license_text: boolean, package_data: array<struct<manifest_path:
    string>>.

    license rows: every file flagged is_license_text. package rows: one
    per package_data entry — `{path}/{manifest_path}` when the file is a
    directory carrying a manifest subpath (empty dir path omits the
    slash), else the file's own path. Distinct per (doc, kind, path):
    the reference attaches by path, which is idempotent per document.
    """
    licenses = files.filter(F.col("is_license_text")).select(
        "doc", F.lit("license").alias("kind"), F.col("path").alias("attach_path")
    )
    pkg = files.select(
        "doc", "path", "ftype", F.explode("package_data").alias("entry")
    ).select(
        "doc",
        F.lit("package").alias("kind"),
        F.when(
            # `entry.manifest_path` in the reference is a TRUTHINESS test:
            # an empty string falls through to the file's own path, not
            # to a 'dir/' concat with an empty subpath
            (F.col("ftype") == "directory")
            & F.col("entry.manifest_path").isNotNull()
            & (F.col("entry.manifest_path") != ""),
            F.concat(
                F.when(F.col("path") != "", F.concat(F.col("path"), F.lit("/"))).otherwise(F.lit("")),
                F.col("entry.manifest_path"),
            ),
        ).otherwise(F.col("path")).alias("attach_path"),
    )
    return licenses.unionByName(pkg).distinct()


def scancode_has_real_errors(files: DataFrame) -> DataFrame:
    """Per-doc triage of scan_errors (scancode.js:99-117): an error is
    REAL unless it contains one of the four known-benign markers; a doc
    with any real error is marked dead. Input columns: doc, scan_errors:
    array<string>. Output: (doc, has_real_errors)."""
    is_benign = lambda e: (  # noqa: E731 — single-expression predicate
        F.contains(e, F.lit(_BENIGN_ERROR_PATTERNS[0]))
        | F.contains(e, F.lit(_BENIGN_ERROR_PATTERNS[1]))
        | F.contains(e, F.lit(_BENIGN_ERROR_PATTERNS[2]))
        | F.contains(e, F.lit(_BENIGN_ERROR_PATTERNS[3]))
    )
    real = F.exists(F.col("scan_errors"), lambda e: ~is_benign(e))
    return files.groupBy("doc").agg(
        F.max(F.coalesce(real, F.lit(False))).alias("has_real_errors")
    )


# fsfeReuse.js:101 — ((first): )((second): )? value
_SPDX_ATTR_RE = r"(\w+):\s(?:(\w+):\s)?(.+)"


def reuse_spdx_records(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Parse REUSE `spdx` output into long-format records
    (fsfeReuse.js:85-138). Sections split on blank lines; section 0 is
    document metadata (Relationship lines dropped), later sections are
    one file each. Attribute key = first key + optional secondary key
    concatenated; values strip `<...>` markup; FileName drops a leading
    './'; FileCopyrightText drops the 'SPDX-FileCopyrightText: ' prefix.

    Output: (doc, section_idx, scope ∈ {metadata, file}, key, value).
    """
    sections = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\n\n")).alias("section_idx", "section"),
    )
    lines = sections.select(
        "doc", "section_idx", F.explode(F.split(F.col("section"), r"\n")).alias("line")
    )
    first = F.regexp_extract(F.col("line"), _SPDX_ATTR_RE, 1)
    second = F.regexp_extract(F.col("line"), _SPDX_ATTR_RE, 2)
    raw_value = F.regexp_replace(
        F.regexp_extract(F.col("line"), _SPDX_ATTR_RE, 3), r"<\/?[^>]+>", ""
    )
    key = F.concat(first, second)  # secondary '' concats away
    value = (
        F.when(
            (key == "FileName") & raw_value.startswith("./"), F.substring(raw_value, 3, 1 << 20)
        )
        .when(
            (key == "FileCopyrightText") & raw_value.startswith("SPDX-FileCopyrightText: "),
            F.substring(raw_value, 25, 1 << 20),
        )
        .otherwise(raw_value)
    )
    parsed = lines.filter(first != "").select(
        "doc", "section_idx",
        F.when(F.col("section_idx") == 0, "metadata").otherwise("file").alias("scope"),
        key.alias("key"), value.alias("value"),
    )
    # metadata ignores Relationship on purpose (fsfeReuse.js:118-123);
    # file sections keep every attribute
    return parsed.filter(~((F.col("scope") == "metadata") & (F.col("key") == "Relationship")))


def sourceextract_description(files: DataFrame) -> DataFrame:
    """clearly.yaml → document.description (P14,
    providers/process/sourceExtract.js:24-31): the file must sit at the
    clone ROOT (`path.join(location, 'clearly.yaml')` — nested copies are
    ignored); an absent file leaves the document without a description.
    The reference safeLoads arbitrary YAML; the modeled subset is the
    top-level `key: value` scalar map (the documented clearly.yaml
    shape), comments and blank lines skipped, surrounding quotes
    stripped. Long-format output keeps the oracle value-exact.

    Input columns: doc, path, content. Output: (doc, key, value).
    """
    lines = files.filter(F.col("path") == "clearly.yaml").select(
        "doc", F.explode(F.split(F.col("content"), r"\n")).alias("line")
    )
    m = r"^([A-Za-z_][\w.-]*):\s*(.*?)\s*$"
    key = F.regexp_extract(F.col("line"), m, 1)
    raw = F.regexp_extract(F.col("line"), m, 2)
    unquoted = F.regexp_replace(raw, r"^['\"]|['\"]$", "")
    return lines.filter(
        (key != "") & ~F.trim(F.col("line")).startswith("#")
    ).select("doc", key.alias("key"), unquoted.alias("value"))


def reuse_license_entries(listing: DataFrame) -> DataFrame:
    """LICENSES/ dir listing → license records (fsfeReuse.js:140-156):
    filePath = 'LICENSES/<file>', spdxId = file.substring(0,
    indexOf('.txt')) — which is '' when the name has no '.txt' (JS
    substring(0, -1) quirk), and truncates at the FIRST occurrence.
    Input columns: doc, file_name."""
    idx = F.instr(F.col("file_name"), ".txt")  # 1-based; 0 = absent
    spdx_id = F.when(idx > 0, F.substring(F.col("file_name"), 1, idx - 1)).otherwise(F.lit(""))
    return listing.select(
        "doc",
        F.concat(F.lit("LICENSES/"), F.col("file_name")).alias("file_path"),
        spdx_id.alias("spdx_id"),
    )


def fossology_document(
    runs: DataFrame, files: DataFrame, chunk_size: int = 500
) -> DataFrame:
    """P20 fossology run algebra (providers/process/fossology.js) — the
    relational meaning of the three-agent run, modeled exactly; the agent
    binaries themselves are process glue (spawn/execFile against a local
    FOSSology build, disabled in the reference's own config,
    config/cdConfig.js:78-81).

    Semantics modeled, with fossology.js cites:

    * routing (handle, :30-41): disabled → Skipped('Disabled'); version
      detection failed → Skipped('not properly configured'); a nomos
      spawn failure → request ERROR (the close handler resolves null,
      :83-86, and `result.replace` on :88 then throws — the request fails
      up to the queue's retry layer, it is NOT markDead). The
      markDead('Error', 'no results') branch (:48-50) is UNREACHABLE in
      the reference: `_runNomos`/`_runCopyright` always return truthy
      objects (copyright returns `{... content: []}` even with zero
      files), so "all three falsy" cannot occur — modeled as such.
    * nomos (:63-93): one run over the whole tree; the location prefix
      `{location}/` is stripped with a global replace TWICE (once in the
      close handler :88, once building the output :91) — observable when
      the first pass splices new occurrences together, so both passes are
      modeled literally.
    * copyright (:95-133): per-file `copyright --files <f> -J`; a file
      contributes `{path, output: JSON.parse(stdout)}` iff stdout is
      non-empty and parses (empty → falsy guard :102, parse throw →
      caught :104-106, either way the file is silently dropped); result
      order is the file-walk order. Validity is expressed as
      `get_json_object(j, '$') IS NOT NULL` (DuckDB mirror:
      `json_valid`) — equal on JSON-object-or-garbage inputs.
    * monk (:134-171): files chunked 500 per invocation IN WALK ORDER
      (chunk membership counts every file, not just matching ones), each
      chunk's stdout location-stripped once (:163) and concatenated;
      monk attaches only if the total content is non-empty (:167-170) —
      a chunk whose stripped output is empty contributes nothing, so
      empty chunks are dropped rather than emitted as '' rows.
    * versions (:173-219): nomos `-V` is the tool version, monk and
      copyright hard-code '0.0.0' — constants, not modeled as rows.

    Inputs: `runs` (doc, location, disabled bool, version_detected bool,
    nomos_raw string NULLABLE — NULL models the spawn error); `files`
    (doc, file_idx long — filterFiles walk order, path,
    copyright_json string nullable, monk_text string).

    Output long-format rows (doc, section, idx, path, content):
    fate rows for every doc; nomos / copyright / monk rows only for
    attached docs. All pure column expressions — no UDFs; the only
    shuffles are the per-doc window/agg on the files table.
    """
    fate = (
        F.when(F.col("disabled"), F.lit("skip:disabled"))
        .when(~F.col("version_detected"), F.lit("skip:unconfigured"))
        .when(F.col("nomos_raw").isNull(), F.lit("error:nomos"))
        .otherwise(F.lit("attached"))
    )
    r = runs.withColumn("_fate", fate)
    nul = F.lit(None).cast("string")
    zero = F.lit(0).cast("int")
    fates = r.select(
        "doc", F.lit("fate").alias("section"), zero.alias("idx"),
        nul.alias("path"), F.col("_fate").alias("content"),
    )
    attached = r.filter(F.col("_fate") == "attached")
    prefix = F.concat(F.col("location"), F.lit("/"))
    strip = lambda c: F.replace(c, prefix, F.lit(""))  # noqa: E731
    nomos = attached.select(
        "doc", F.lit("nomos").alias("section"), zero.alias("idx"),
        nul.alias("path"), strip(strip(F.col("nomos_raw"))).alias("content"),
    )
    af = files.join(attached.select("doc", "location"), "doc")
    from pyspark.sql import Window

    w = Window.partitionBy("doc").orderBy("file_idx")
    kept = af.filter(
        F.col("copyright_json").isNotNull()
        & (F.col("copyright_json") != "")
        & F.get_json_object(F.col("copyright_json"), "$").isNotNull()
    )
    copyright = kept.withColumn("idx", (F.row_number().over(w) - 1).cast("int")).select(
        "doc", F.lit("copyright").alias("section"), "idx",
        F.col("path"), F.col("copyright_json").alias("content"),
    )
    monk = (
        af.withColumn("_chunk", F.floor((F.row_number().over(w) - 1) / chunk_size))
        .groupBy("doc", "_chunk")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("file_idx", "monk_text"))),
                    lambda s: s["monk_text"],
                ),
            ).alias("_raw"),
            F.first("location").alias("location"),
        )
        .withColumn("content", strip(F.col("_raw")))
        .filter(F.col("content") != "")
        .select(
            "doc", F.lit("monk").alias("section"), F.col("_chunk").cast("int").alias("idx"),
            nul.alias("path"), "content",
        )
    )
    return fates.unionByName(nomos).unionByName(copyright).unionByName(monk)
