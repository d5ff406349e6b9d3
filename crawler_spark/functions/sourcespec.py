"""SourceSpec URL rendering (lib/sourceSpec.js:40-55 `toUrl`): an
explicit `url` wins; otherwise the provider picks the builder —

* github / gitlab → gitCloner._buildUrl (gitCloner.js:92-95):
  `https://{host}/{namespace with '.'→'/'}/{name}.git`
* mavencentral → mavenBasedFetch._buildUrl (mavenBasedFetch.js:91-98)
  over `https://search.maven.org/remotecontent?filepath=`:
  `{base}{ns '.'→'/'}/{name}/{rev}/{name}-{rev}{ext}` (default .jar;
  sourcearchive downloads use -sources.jar via _getArtifact)
* mavengoogle → same shape over `https://dl.google.com/android/maven2/`
* anything else → null

JS faithfulness note: mavenBasedFetch uses `spec.namespace?.replace`,
so a missing namespace renders the literal string 'undefined' in the
URL — mirrored here with a coalesce.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from crawler_spark.functions.mavenfetch import maven_artifact_url, slashed_ns

_GIT_HOSTS = {"github": "https://github.com", "gitlab": "https://gitlab.com"}
_MAVEN_BASES = {
    "mavencentral": "https://search.maven.org/remotecontent?filepath=",
    "mavengoogle": "https://dl.google.com/android/maven2/",
}


def source_url(
    provider: Column,
    namespace: Column,
    name: Column,
    revision: Column,
    url: Column | None = None,
    extension: str = ".jar",
) -> Column:
    """sourceSpec.toUrl as a column expression."""
    git = F.concat(
        F.coalesce(
            *[F.when(provider == p, F.lit(h)) for p, h in _GIT_HOSTS.items()]
        ),
        F.lit("/"), slashed_ns(namespace), F.lit("/"), name, F.lit(".git"),
    )
    # one shared _buildUrl template (mavenfetch.maven_artifact_url),
    # sourceSpec's own 2-provider base map — mirrors sourceSpec.js:48-51
    # delegating to the concrete fetchers' _buildUrl
    maven = maven_artifact_url(
        provider, namespace, name, revision, F.lit(extension), bases=_MAVEN_BASES
    )
    built = (
        F.when(provider.isin(*_GIT_HOSTS), git)
        .when(provider.isin(*_MAVEN_BASES), maven)
    )
    return F.coalesce(url, built) if url is not None else built
