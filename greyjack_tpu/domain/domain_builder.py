"""User persistence contract.

Reference: `greyjack/src/domain/domain_builder_trait.rs:3-30`. A domain
builder can build the domain from scratch, from a solution JSON (for
multi-stage solving / replanning — beware that the solution only carries
planning-variable values, so non-planned state must come from
`initial_domain`), or clone an existing domain object.
"""

import copy


class DomainBuilderBase:
    def build_domain_from_scratch(self):
        raise NotImplementedError

    def build_from_solution(self, solution, initial_domain=None):
        raise NotImplementedError

    def build_from_domain(self, domain):
        return copy.deepcopy(domain)
