"""DuckDB twins of the nested-struct queries (nested.py).

Each SQL builds the same nested value with struct_pack/MAP and
serializes with to_json — byte-identical to Spark's to_json (null
fields rendered, declaration-order keys, empty maps as {}).
"""

from __future__ import annotations

from .oracle import ALARM_CTES, STATE_CASE

# shared payload CTEs appended after ALARM_CTES
_NESTED_CTES = """
reg_struct AS (
  SELECT name,
         struct_pack(
           action := CASE WHEN priority IS NOT NULL THEN struct_pack(
             latchable := latchable,
             system := system,
             filterable := filterable,
             correctiveaction := correctiveaction,
             priority := priority,
             rationale := rationale,
             ondelayseconds := ondelayseconds,
             offdelayseconds := offdelayseconds) END,
           alarm := struct_pack(
             action := action,
             source := struct_pack(pv := pv),
             location := location)
         ) AS registration
  FROM registrations
),
act_union AS (
  SELECT name,
         CASE WHEN union_type IS NOT NULL
              THEN struct_pack(type := union_type) END AS activation
  FROM (SELECT name, union_type,
               row_number() OVER (PARTITION BY name ORDER BY seq DESC) AS rn
        FROM activations_log) t
  WHERE rn = 1
),
ovr_payload AS (
  SELECT name,
    max(CASE WHEN type = 'Disabled'  THEN comments   END) AS disabled_comments,
    max(CASE WHEN type = 'OnDelayed' THEN expiration END) AS ondelayed_expiration,
    max(CASE WHEN type = 'Shelved'   THEN oneshot    END) AS shelved_oneshot,
    max(CASE WHEN type = 'Shelved'   THEN expiration END) AS shelved_expiration,
    max(CASE WHEN type = 'Shelved'   THEN reason     END) AS shelved_reason,
    max(CASE WHEN type = 'Shelved'   THEN comments   END) AS shelved_comments
  FROM ovr_live GROUP BY name
),
assembled AS (
  SELECT s.*, r.registration, a.activation,
         p.disabled_comments, p.ondelayed_expiration, p.shelved_oneshot,
         p.shelved_expiration, p.shelved_reason, p.shelved_comments
  FROM settled s
  LEFT JOIN reg_struct r ON s.name = r.name
  LEFT JOIN act_union a ON s.name = a.name
  LEFT JOIN ovr_payload p ON s.name = p.name
)
""".strip()

_OVERRIDES_STRUCT = """
struct_pack(
  disabled := CASE WHEN ov_disabled THEN
    struct_pack(comments := disabled_comments) END,
  filtered := CASE WHEN ov_filtered THEN MAP([],[]) END,
  latched := CASE WHEN ov_latched THEN MAP([],[]) END,
  masked := CASE WHEN ov_masked THEN MAP([],[]) END,
  offdelayed := CASE WHEN ov_offdelayed THEN MAP([],[]) END,
  ondelayed := CASE WHEN ov_ondelayed THEN
    struct_pack(expiration := ondelayed_expiration) END,
  shelved := CASE WHEN ov_shelved THEN struct_pack(
    oneshot := shelved_oneshot,
    expiration := shelved_expiration,
    reason := shelved_reason,
    comments := shelved_comments) END
)
""".strip()

_NOTIFICATION_STRUCT = f"""
struct_pack(
  activation := activation,
  overrides := {_OVERRIDES_STRUCT},
  state := {STATE_CASE}
)
""".strip()

_TRANSITIONS_STRUCT = """
struct_pack(
  transitionToActive := transition_to_active,
  transitionToNormal := transition_to_normal,
  latching := latching,
  unshelving := unshelving,
  ondelaying := ondelaying,
  offdelaying := false,
  masking := false,
  unmasking := false
)
""".strip()

EFFECTIVE_REGISTRATIONS_NESTED_SQL = f"""
WITH {ALARM_CTES},
{_NESTED_CTES}
SELECT name, to_json(registration) AS registration FROM reg_struct
"""

EFFECTIVE_NOTIFICATIONS_NESTED_SQL = f"""
WITH {ALARM_CTES},
{_NESTED_CTES}
SELECT name, to_json({_NOTIFICATION_STRUCT}) AS notification
FROM assembled
"""

EFFECTIVE_ALARMS_NESTED_SQL = f"""
WITH {ALARM_CTES},
{_NESTED_CTES}
SELECT name,
       to_json(struct_pack(
         registration := registration,
         notification := {_NOTIFICATION_STRUCT}
       )) AS effective_alarm
FROM assembled
"""

INTERMEDIATE_MONOLOG_NESTED_SQL = f"""
WITH {ALARM_CTES},
{_NESTED_CTES}
SELECT name,
       to_json(struct_pack(
         registration := registration,
         notification := {_NOTIFICATION_STRUCT},
         transitions := {_TRANSITIONS_STRUCT}
       )) AS monolog
FROM assembled
"""
