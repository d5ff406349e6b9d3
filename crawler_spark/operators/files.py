"""Per-file tree operations (P16-P19) — the AbstractClearlyDefinedProcessor
file walk re-expressed over a `files(doc_id, path, content)` table
(/root/reference/providers/process/abstractClearlyDefinedProcessor.js):

* _computeSize (15-93): non-git file count + size in KiB
* _addFiles (40-54): per-file sha1 + sha256
* _isInterestinglyNamed (56-79): LICENSE/NOTICE/… basename patterns with
  the extension allow-list; matches become attachments whose token is
  sha256(content) (abstractProcessor.js:97-113)
* licensee uniqBy(spdx_id) merge (providers/process/licensee.js:64-66)

Everything is one projection + one groupBy keyed on doc_id — map-side
partial aggregation, no skew (doc file counts are bounded). At 100 TB the
files table is the exploded form of the archive listing; these plans are
the same shape regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# _isInterestinglyNamed patterns + extension allow-list
# (abstractClearlyDefinedProcessor.js:60-74)
INTERESTING_BASES = (
    "LICENSE", "LICENSE-MIT", "LICENSE-APACHE", "UNLICENSE", "COPYING",
    "NOTICE", "NOTICES", "CONTRIBUTORS", "PATENTS",
)
INTERESTING_EXTENSIONS = (".MD", ".HTML", ".TXT")


def _is_git_file(path: Column) -> Column:
    # utils.js isGitFile matches any PATH SEGMENT equal to '.git', which
    # includes a last segment named '.git' (a submodule gitlink file) —
    # hence the endswith arm alongside the directory-prefix forms
    return (
        path.startswith(".git/")
        | path.contains("/.git/")
        | path.endswith("/.git")
        | (path == ".git")
    )


def is_interestingly_named(path: Column) -> Column:
    """The reference uppercases the root-relative path, takes
    path.extname / path.basename, requires any extension to be in the
    allow-list and the extension-less basename to be a known pattern."""
    name = F.upper(path)
    base_full = F.element_at(F.split(name, "/"), -1)  # basename incl. ext
    # path.extname: last '.suffix' of the basename, '' when absent; a
    # leading-dot-only name ('.GITIGNORE') has NO extension in node
    ext = F.regexp_extract(base_full, r".(\.[^.]*)$", 1)
    ext_ok = (ext == "") | ext.isin(*INTERESTING_EXTENSIONS)
    base = F.when(
        ext != "",
        F.substring(base_full, F.lit(1), F.length(base_full) - F.length(ext)),
    ).otherwise(base_full)
    return (name != "") & ext_ok & base.isin(*INTERESTING_BASES)


def file_summary(files: DataFrame, doc_col: str = "doc_id",
                 path_col: str = "path", content_col: str = "content") -> DataFrame:
    """_computeSize: per doc, non-git file count + KiB (round(bytes/1024),
    HALF_UP like Math.round)."""
    f = files.filter(~_is_git_file(F.col(path_col)))
    return f.groupBy(F.col(doc_col).alias("doc_id")).agg(
        F.count("*").alias("count"),
        F.round(F.sum(F.octet_length(F.col(content_col))) / 1024.0, 0).cast("long").alias("k"),
    )


def file_hashes(files: DataFrame, doc_col: str = "doc_id",
                path_col: str = "path", content_col: str = "content") -> DataFrame:
    """_addFiles: every file row with its sha1 + sha256 (the reference's
    computeHashes, lib/baseHandler.js:36-61)."""
    return files.select(
        F.col(doc_col).alias("doc_id"),
        F.col(path_col).alias("path"),
        F.sha1(F.col(content_col).cast("binary")).alias("sha1"),
        F.sha2(F.col(content_col).cast("string"), 256).alias("sha256"),
    )


def interesting_attachments(files: DataFrame, doc_col: str = "doc_id",
                            path_col: str = "path", content_col: str = "content") -> DataFrame:
    """Interestingly-named files become attachments: (doc_id, path,
    token=sha256(content)) — the visible `attachments` list
    (abstractProcessor.js:97-113)."""
    return files.filter(is_interestingly_named(F.col(path_col))).select(
        F.col(doc_col).alias("doc_id"),
        F.col(path_col).alias("path"),
        F.sha2(F.col(content_col).cast("string"), 256).alias("token"),
    )


def licensee_merge(results: DataFrame, doc_col: str = "doc_id",
                   order_col: str = "folder_idx", spdx_col: str = "spdx_id") -> DataFrame:
    """licensee.js:64-66 `uniqBy(flatten(results.licenses), 'spdx_id')`:
    per (doc, spdx_id) the FIRST folder's record wins (root folder first,
    then subfolders in listing order)."""
    other = [c for c in results.columns if c not in (doc_col, order_col, spdx_col)]
    return (
        results.groupBy(F.col(doc_col).alias("doc_id"), F.col(spdx_col).alias("spdx_id"))
        .agg(*[F.min_by(F.col(c), F.col(order_col)).alias(c) for c in other])
    )
