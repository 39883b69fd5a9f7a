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


# Per-event EffectiveAlarm history — the reference's true published
# stream. Same merged-changelog window pass as the flat history
# oracle, with payload windows added; assembly mirrors nested.py
# q_effective_state_history_nested.
from .oracle import _OV_HIST_COLS  # noqa: E402

_HIST_NESTED_STATE = """
CASE WHEN ov_disabled THEN 'NormalDisabled'
     WHEN ov_filtered THEN 'NormalFiltered'
     WHEN ov_masked THEN 'NormalMasked'
     WHEN ov_shelved THEN
          (CASE WHEN shelved_oneshot THEN 'NormalOneShotShelved'
                ELSE 'NormalContinuousShelved' END)
     WHEN ov_ondelayed THEN 'NormalOnDelayed'
     WHEN ov_latched THEN 'ActiveLatched'
     WHEN ov_offdelayed THEN 'ActiveOffDelayed'
     WHEN active THEN 'Active'
     ELSE 'Normal' END
""".strip()

EFFECTIVE_STATE_HISTORY_NESTED_SQL = f"""
WITH {ALARM_CTES},
merged AS (
  SELECT seq, name, 'A' AS tag, cur_active,
         CAST(NULL AS VARCHAR) AS ovr_type,
         CAST(NULL AS BOOLEAN) AS ovr_live,
         CAST(NULL AS BOOLEAN) AS ovr_oneshot,
         CAST(NULL AS VARCHAR) AS action_sentinel,
         prev_active,
         coalesce(f.union_type, '__none__') AS union_sentinel,
         CAST(NULL AS BIGINT) AS expiration,
         CAST(NULL AS VARCHAR) AS comments,
         CAST(NULL AS VARCHAR) AS reason,
         CAST(NULL AS VARCHAR) AS pv,
         CAST(NULL AS VARCHAR[]) AS location
  FROM (SELECT a.*, l.union_type
        FROM act_flags a JOIN activations_log l
          ON a.name = l.name AND a.seq = l.seq) f
  UNION ALL
  SELECT seq, name, 'O', NULL, type, NOT tombstone,
         CASE WHEN tombstone THEN false ELSE coalesce(oneshot, false) END,
         NULL, NULL, NULL, expiration, comments, reason, NULL, NULL
  FROM overrides_log
  UNION ALL
  SELECT seq, name, 'R', NULL, NULL, NULL, NULL,
         coalesce(action, '__deleted__'), NULL, NULL, NULL, NULL, NULL,
         pv, location
  FROM instances_log
),
asof_state AS (
  SELECT seq, name, tag,
    coalesce(last_value(cur_active IGNORE NULLS) OVER w, false) AS active,
    CASE WHEN tag = 'A' THEN cur_active AND NOT prev_active
         ELSE false END AS t_to_active,
    CASE WHEN tag = 'A' THEN (NOT cur_active) AND prev_active
         ELSE false END AS t_to_normal,
{_OV_HIST_COLS}
    coalesce(last_value(CASE WHEN tag='O' AND ovr_type='Shelved'
               THEN ovr_oneshot END IGNORE NULLS) OVER w, false)
      AS shelved_oneshot,
    nullif(last_value(action_sentinel IGNORE NULLS) OVER w, '__deleted__')
      AS action_eff,
    nullif(last_value(union_sentinel IGNORE NULLS) OVER w, '__none__')
      AS union_eff,
    last_value(CASE WHEN tag='O' AND ovr_type='Disabled'
               THEN struct_pack(live := ovr_live, comments := comments)
               END IGNORE NULLS) OVER w AS d_pay,
    last_value(CASE WHEN tag='O' AND ovr_type='OnDelayed'
               THEN struct_pack(live := ovr_live, expiration := expiration)
               END IGNORE NULLS) OVER w AS od_pay,
    last_value(CASE WHEN tag='O' AND ovr_type='Shelved'
               THEN struct_pack(live := ovr_live, oneshot := ovr_oneshot,
                                expiration := expiration, reason := reason,
                                comments := comments)
               END IGNORE NULLS) OVER w AS sh_pay,
    last_value(pv IGNORE NULLS) OVER w AS pv_eff,
    last_value(location IGNORE NULLS) OVER w AS location_eff
  FROM merged
  WINDOW w AS (PARTITION BY name ORDER BY seq
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
hist AS (
  SELECT a.*, d.latchable, d.ondelayseconds, d.system, d.filterable,
         d.correctiveaction, d.priority, d.rationale, d.offdelayseconds
  FROM asof_state a LEFT JOIN actions d ON a.action_eff = d.name
)
SELECT seq, name,
  to_json(struct_pack(
    registration := CASE WHEN action_eff IS NOT NULL THEN struct_pack(
      action := CASE WHEN priority IS NOT NULL THEN struct_pack(
        latchable := latchable, system := system, filterable := filterable,
        correctiveaction := correctiveaction, priority := priority,
        rationale := rationale, ondelayseconds := ondelayseconds,
        offdelayseconds := offdelayseconds) END,
      alarm := struct_pack(
        action := action_eff,
        source := struct_pack(pv := pv_eff),
        location := location_eff)
    ) END,
    notification := struct_pack(
      activation := CASE WHEN union_eff IS NOT NULL
                         THEN struct_pack(type := union_eff) END,
      overrides := struct_pack(
        disabled := CASE WHEN ov_disabled THEN
          struct_pack(comments := d_pay.comments) END,
        filtered := CASE WHEN ov_filtered THEN MAP([],[]) END,
        latched := CASE WHEN ov_latched THEN MAP([],[]) END,
        masked := CASE WHEN ov_masked THEN MAP([],[]) END,
        offdelayed := CASE WHEN ov_offdelayed THEN MAP([],[]) END,
        ondelayed := CASE WHEN ov_ondelayed THEN
          struct_pack(expiration := od_pay.expiration) END,
        shelved := CASE WHEN ov_shelved THEN struct_pack(
          oneshot := sh_pay.oneshot, expiration := sh_pay.expiration,
          reason := sh_pay.reason, comments := sh_pay.comments) END
      ),
      state := {_HIST_NESTED_STATE}
    )
  )) AS effective_alarm
FROM hist
WHERE NOT (
      (coalesce(latchable, false) AND t_to_active AND NOT ov_latched)
   OR (coalesce(ondelayseconds > 0, false) AND t_to_active
       AND NOT ov_ondelayed)
   OR (ov_shelved AND shelved_oneshot AND t_to_normal)
)
"""
