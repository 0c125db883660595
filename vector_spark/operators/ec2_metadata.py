"""aws_ec2_metadata — stamp environment metadata fields onto every event.

Parity: reference src/transforms/aws_ec2_metadata.rs polls IMDS and adds
fields like ``instance-id``, ``region``, ``availability-zone`` to each
event (optionally under a namespace, with a ``fields`` allowlist). The
IMDS HTTP client is environment plumbing, not dataflow: on a cluster the
metadata is fetched ONCE driver-side (or injected by the deployment) and
becomes literal columns — which is also the only scale-sane design
(per-row metadata lookups at 10^12 rows would be absurd; the reference
caches for the same reason).

``fetch`` defaults to a stub that raises (no IMDS in this sandbox); pass
``metadata`` directly, or a real fetcher on EC2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the reference's default field set (aws_ec2_metadata.rs keys)
DEFAULT_FIELDS = [
    "ami-id", "availability-zone", "instance-id", "instance-type",
    "local-hostname", "local-ipv4", "public-hostname", "public-ipv4",
    "region", "subnet-id", "vpc-id", "account-id",
]


def _no_imds() -> dict:
    raise RuntimeError(
        "no IMDS endpoint in this environment — pass metadata= explicitly"
    )


def aws_ec2_metadata(
    df: DataFrame,
    metadata: dict[str, str] | None = None,
    fields: list[str] | None = None,
    namespace: str | None = None,
    fetch: Callable[[], dict] = _no_imds,
) -> DataFrame:
    """Add metadata fields as literal columns (names sanitized ``-``→``_``;
    ``namespace`` prefixes like the reference's namespace option;
    ``fields`` allowlists which keys are stamped)."""
    meta = metadata if metadata is not None else fetch()
    keep = fields if fields is not None else list(meta)
    out = df
    for key in keep:
        if key not in meta:
            continue
        name = key.replace("-", "_")
        if namespace:
            name = f"{namespace}_{name}"
        out = out.withColumn(name, F.lit(meta[key]))
    return out
