"""Catalog access grants + tag-based access (C3).

The reference's stage job grants its Glue role Lake Formation
permissions on the stage database (ALL, with grant option), grants
ASSOCIATE on the LF-tag ``Level=Stage``, and then attaches that tag to
the database so future resources inherit access via the tag
(crawlers_job.py:109-170: ``grant_permissions_to_database_lakeformation``,
``grant_permissions_lf_tag_lakeformation``,
``add_lf_tags_to_database_lakeformation``).

Lake Formation is an AWS service; the engine-side equivalent is a
permission model with the same two grant paths — direct resource
grants and tag-expression grants that resources inherit by carrying
the tag — plus an enforcement check callable from catalog operations
(e.g. before ManagedTable.register / a governed read). The registry is
driver-side metadata: O(#grants) lookups, nothing data-sized.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Resource:
    """A database or table resource, optionally carrying LF-style tags
    (tags are attached via the registry, not here)."""

    kind: str  # 'database' | 'table'
    name: str  # 'db' or 'db.table'

    def parents(self) -> list["Resource"]:
        """A table inherits database-level grants (LF semantics)."""
        if self.kind == "table" and "." in self.name:
            return [Resource("database", self.name.split(".", 1)[0])]
        return []


ALL = "ALL"
ASSOCIATE = "ASSOCIATE"


@dataclass
class GrantRegistry:
    """Grants and LF-tags with the reference's two access paths."""

    # (principal, resource kind, resource name) -> set of permissions
    _direct: dict[tuple[str, str, str], set[str]] = field(default_factory=dict)
    # (principal, tag key, tag value) -> set of permissions
    _tag_grants: dict[tuple[str, str, str], set[str]] = field(default_factory=dict)
    # (resource kind, resource name) -> {tag key: tag value}
    _resource_tags: dict[tuple[str, str], dict[str, str]] = field(
        default_factory=dict
    )
    # (principal, resource kind, resource name, permission) grants that
    # may be re-granted by the principal
    _grant_option: set[tuple[str, str, str, str]] = field(default_factory=set)
    # (principal, tag key, tag value, permission) grant options given
    # through the tag path — consulted by can_grant via resource tags
    _tag_grant_option: set[tuple[str, str, str, str]] = field(
        default_factory=set
    )

    # -- the three reference operations ---------------------------------

    def grant_permissions(
        self,
        principal: str,
        resource: Resource,
        permissions: list[str],
        permissions_with_grant_option: list[str] | None = None,
    ) -> None:
        """crawlers_job.py:109-125 — direct resource grant."""
        key = (principal, resource.kind, resource.name)
        self._direct.setdefault(key, set()).update(permissions)
        for p in permissions_with_grant_option or []:
            self._direct.setdefault(key, set()).add(p)
            self._grant_option.add((principal, resource.kind, resource.name, p))

    def grant_tag_permissions(
        self,
        principal: str,
        tag_key: str,
        tag_values: list[str],
        permissions: list[str],
        permissions_with_grant_option: list[str] | None = None,
    ) -> None:
        """crawlers_job.py:128-149 — LF-tag grant (e.g. ASSOCIATE on
        Level=Stage)."""
        for v in tag_values:
            k = (principal, tag_key, v)
            self._tag_grants.setdefault(k, set()).update(permissions)
            self._tag_grants[k].update(permissions_with_grant_option or [])
            for p in permissions_with_grant_option or []:
                self._tag_grant_option.add((principal, tag_key, v, p))

    def add_tags_to_resource(
        self, resource: Resource, tags: dict[str, str], principal: str | None = None
    ) -> None:
        """crawlers_job.py:152-168 — attach tags to a resource so
        tag-granted principals gain access through them. When a
        principal is given, it must hold ASSOCIATE on each tag — the
        check the reference delegates to LF itself."""
        for k, v in tags.items():
            if principal is not None and ASSOCIATE not in self._tag_grants.get(
                (principal, k, v), set()
            ):
                raise PermissionError(
                    f"{principal} lacks ASSOCIATE on tag {k}={v}"
                )
        self._resource_tags.setdefault(
            (resource.kind, resource.name), {}
        ).update(tags)

    # -- enforcement ------------------------------------------------------

    def permissions_for(self, principal: str, resource: Resource) -> set[str]:
        """Effective permissions: direct grants on the resource and its
        parents, plus tag grants matched against the resource's (and
        parents') attached tags. ALL implies everything."""
        perms: set[str] = set()
        for res in [resource, *resource.parents()]:
            # ASSOCIATE ≠ data access on EITHER path: it only authorizes
            # attaching the tag (add_tags_to_resource checks it against
            # _tag_grants directly), so a direct ASSOCIATE grant must
            # not pass check() either
            perms |= (
                self._direct.get((principal, res.kind, res.name), set())
                - {ASSOCIATE}
            )
            tags = self._resource_tags.get((res.kind, res.name), {})
            for (p, tk, tv), granted in self._tag_grants.items():
                if p == principal and tags.get(tk) == tv:
                    perms |= granted - {ASSOCIATE}
        return perms

    def check(self, principal: str, permission: str, resource: Resource) -> None:
        """Raise PermissionError unless the principal holds the
        permission (or ALL) on the resource."""
        perms = self.permissions_for(principal, resource)
        if permission not in perms and ALL not in perms:
            raise PermissionError(
                f"{principal} lacks {permission} on {resource.kind}"
                f" {resource.name}"
            )

    def can_grant(
        self, principal: str, permission: str, resource: Resource
    ) -> bool:
        """True when the principal may re-grant ``permission`` on the
        resource: a direct grant option, or a tag-path grant option on
        any tag the resource (or a parent) carries."""
        if (
            principal,
            resource.kind,
            resource.name,
            permission,
        ) in self._grant_option:
            return True
        for res in [resource, *resource.parents()]:
            tags = self._resource_tags.get((res.kind, res.name), {})
            for tk, tv in tags.items():
                if (principal, tk, tv, permission) in self._tag_grant_option:
                    return True
        return False


def bootstrap_stage_grants(
    registry: GrantRegistry, job_role: str, database: str
) -> None:
    """The reference's exact bootstrap sequence for a stage database
    (crawlers_job.py: grant ALL on the database with grant option,
    grant ASSOCIATE on Level=Stage, then tag the database)."""
    registry.grant_permissions(
        job_role, Resource("database", database), [ALL], [ALL]
    )
    registry.grant_tag_permissions(
        job_role, "Level", ["Stage"], [ASSOCIATE], [ASSOCIATE]
    )
    registry.add_tags_to_resource(
        Resource("database", database), {"Level": "Stage"}, principal=job_role
    )
