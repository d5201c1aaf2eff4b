"""Packaged subset of the Public Suffix List (publicsuffix.org).

The PSL is public data maintained by Mozilla (MPL 2.0,
https://publicsuffix.org/list/public_suffix_list.dat).  This module
ships a curated SUBSET — the high-traffic multi-label registrable
suffixes a web crawl actually hits (ccTLD second-level registries,
the wildcard/exception ccTLDs, and the major private hosting
suffixes like ``github.io`` / ``blogspot.com``) — in the upstream
file's own line syntax, so a production deployment upgrades to the
full list by replacing :data:`PSL_TEXT` with the upstream file
verbatim (the parser in ``psl.py`` accepts the full grammar:
comments, exact rules, ``*.`` wildcards, ``!`` exceptions).

Hosts whose suffix is NOT in this subset fall back to the PSL's own
default rule (``*``: the bare TLD is the public suffix, registrable
domain = last two labels) — exactly the behavior of the pre-PSL
regex head in ``urls.py``, so shipping a subset only ever ADDS
correct groupings, never changes a previously-correct one.

Syntax reminder (https://publicsuffix.org/list/): one rule per line;
``// …`` comments; ``*`` matches exactly one label; a ``!`` prefix
marks an exception to a wildcard rule (the public suffix is the
exception with its leading label removed).
"""

# ICANN section: ccTLD second-level registries ------------------------
_ICANN = """
// uk
co.uk
org.uk
me.uk
ltd.uk
plc.uk
net.uk
sch.uk
ac.uk
gov.uk
nhs.uk
police.uk
// au
com.au
net.au
org.au
edu.au
gov.au
asn.au
id.au
// nz
ac.nz
co.nz
cri.nz
geek.nz
gen.nz
govt.nz
health.nz
iwi.nz
kiwi.nz
maori.nz
mil.nz
net.nz
org.nz
parliament.nz
school.nz
// jp
ac.jp
ad.jp
co.jp
ed.jp
go.jp
gr.jp
lg.jp
ne.jp
or.jp
*.kawasaki.jp
*.kitakyushu.jp
*.kobe.jp
*.nagoya.jp
*.sapporo.jp
*.sendai.jp
*.yokohama.jp
!city.kawasaki.jp
!city.kitakyushu.jp
!city.kobe.jp
!city.nagoya.jp
!city.sapporo.jp
!city.sendai.jp
!city.yokohama.jp
// kr
ac.kr
co.kr
es.kr
go.kr
hs.kr
kg.kr
mil.kr
ms.kr
ne.kr
or.kr
pe.kr
re.kr
sc.kr
// cn
ac.cn
com.cn
edu.cn
gov.cn
net.cn
org.cn
mil.cn
// tw
club.tw
com.tw
ebiz.tw
edu.tw
game.tw
gov.tw
idv.tw
mil.tw
net.tw
org.tw
// hk
com.hk
edu.hk
gov.hk
idv.hk
net.hk
org.hk
// sg
com.sg
edu.sg
gov.sg
net.sg
org.sg
per.sg
// in
ac.in
co.in
edu.in
firm.in
gen.in
gov.in
ind.in
mil.in
net.in
nic.in
org.in
res.in
// br
adv.br
art.br
blog.br
com.br
edu.br
eng.br
gov.br
ind.br
inf.br
jus.br
leg.br
med.br
mil.br
mus.br
net.br
org.br
pro.br
rec.br
srv.br
tur.br
tv.br
vet.br
wiki.br
// mx
com.mx
edu.mx
gob.mx
net.mx
org.mx
// ar
com.ar
edu.ar
gob.ar
gov.ar
int.ar
mil.ar
net.ar
org.ar
tur.ar
// tr
av.tr
bbs.tr
bel.tr
biz.tr
com.tr
dr.tr
edu.tr
gen.tr
gov.tr
info.tr
k12.tr
name.tr
net.tr
org.tr
pol.tr
tel.tr
tv.tr
web.tr
// fr
asso.fr
com.fr
gouv.fr
nom.fr
prd.fr
tm.fr
avocat.fr
cci.fr
greta.fr
// il
ac.il
co.il
gov.il
idf.il
k12.il
muni.il
net.il
org.il
// ua
com.ua
edu.ua
gov.ua
in.ua
net.ua
org.ua
kiev.ua
kyiv.ua
lviv.ua
// pl
biz.pl
com.pl
edu.pl
gov.pl
info.pl
net.pl
org.pl
waw.pl
krakow.pl
poznan.pl
wroc.pl
lodz.pl
gda.pl
// id
ac.id
biz.id
co.id
desa.id
go.id
mil.id
my.id
net.id
or.id
sch.id
web.id
// my
com.my
edu.my
gov.my
mil.my
name.my
net.my
org.my
// th
ac.th
co.th
go.th
in.th
mi.th
net.th
or.th
// vn
ac.vn
biz.vn
com.vn
edu.vn
gov.vn
health.vn
info.vn
int.vn
name.vn
net.vn
org.vn
pro.vn
// ph
com.ph
edu.ph
gov.ph
i.ph
mil.ph
net.ph
ngo.ph
org.ph
// pk
biz.pk
com.pk
edu.pk
gov.pk
net.pk
org.pk
web.pk
// sa
com.sa
edu.sa
gov.sa
med.sa
net.sa
org.sa
pub.sa
sch.sa
// ae
ac.ae
co.ae
gov.ae
mil.ae
net.ae
org.ae
sch.ae
// eg
com.eg
edu.eg
eun.eg
gov.eg
mil.eg
name.eg
net.eg
org.eg
sci.eg
// za
ac.za
co.za
edu.za
gov.za
law.za
mil.za
net.za
ngo.za
org.za
school.za
web.za
// ke
ac.ke
co.ke
go.ke
info.ke
me.ke
mobi.ke
ne.ke
or.ke
sc.ke
// ng
com.ng
edu.ng
gov.ng
i.ng
mil.ng
mobi.ng
name.ng
net.ng
org.ng
sch.ng
// it / es / pt / gr / at
gov.it
edu.it
com.es
nom.es
org.es
gob.es
edu.es
com.pt
edu.pt
gov.pt
int.pt
net.pt
org.pt
publ.pt
com.gr
edu.gr
gov.gr
net.gr
org.gr
ac.at
co.at
gv.at
or.at
// ca (federal + provinces)
gc.ca
ab.ca
bc.ca
mb.ca
nb.ca
nf.ca
nl.ca
ns.ca
nt.ca
nu.ca
on.ca
pe.ca
qc.ca
sk.ca
yk.ca
// co (Colombia)
com.co
edu.co
gov.co
mil.co
net.co
nom.co
org.co
// pe / ec / ve / cl / uy
com.pe
edu.pe
gob.pe
mil.pe
net.pe
nom.pe
org.pe
com.ec
gob.ec
gov.ec
edu.ec
net.ec
org.ec
mil.ec
co.ve
com.ve
edu.ve
gob.ve
net.ve
org.ve
gob.cl
gov.cl
mil.cl
com.uy
edu.uy
gub.uy
mil.uy
net.uy
org.uy
// wildcard ccTLDs (every 2nd-level is a registry) + exceptions
*.bd
*.ck
!www.ck
*.er
*.fk
*.jm
*.kh
*.mm
*.np
*.pg
"""

# US state namespaces: <st>.us plus k12/cc/lib.<st>.us -----------------
_US_STATES = (
    "ak al ar az ca co ct dc de fl ga hi ia id il in ks ky la ma md me "
    "mi mn mo ms mt nc nd ne nh nj nm nv ny oh ok or pa ri sc sd tn tx "
    "ut va vt wa wi wv wy"
).split()

_US = "\n".join(
    line
    for st in _US_STATES
    for line in (f"{st}.us", f"k12.{st}.us", f"cc.{st}.us", f"lib.{st}.us")
)

# PRIVATE section: hosted-platform suffixes ---------------------------
# (each label under these belongs to an unrelated party — grouping
# them as one "domain" would let github.io swallow a diversity cap)
_PRIVATE = """
// code / pages hosting
github.io
githubusercontent.com
gitlab.io
bitbucket.io
sourceforge.io
codeberg.page
js.org
keybase.pub
readthedocs.io
neocities.org
gitbook.io
// blogs / site builders
blogspot.com
blogspot.co.uk
blogspot.ca
blogspot.de
blogspot.fr
blogspot.in
blogspot.it
blogspot.jp
blogspot.com.au
blogspot.com.br
blogspot.com.ar
blogspot.com.es
blogspot.com.tr
blogspot.mx
blogspot.nl
blogspot.se
blogspot.sg
blogspot.co.nz
blogspot.co.za
blogspot.co.id
blogspot.co.il
blogspot.co.ke
blogspot.ru
blogspot.pt
blogspot.ro
blogspot.hu
blogspot.ie
blogspot.fi
blogspot.no
blogspot.dk
blogspot.cz
blogspot.sk
blogspot.gr
blogspot.kr
blogspot.tw
blogspot.hk
blogspot.my
blogspot.pe
wordpress.com
wixsite.com
webflow.io
notion.site
super.site
framer.app
framer.website
000webhostapp.com
pythonanywhere.com
eu.pythonanywhere.com
// clouds / paas
appspot.com
web.app
firebaseapp.com
cloudfunctions.net
run.app
translate.goog
herokuapp.com
herokussl.com
netlify.app
vercel.app
now.sh
surge.sh
glitch.me
repl.co
fly.dev
onrender.com
pages.dev
workers.dev
r2.dev
trycloudflare.com
azurewebsites.net
cloudapp.net
cloudapp.azure.com
azurestaticapps.net
trafficmanager.net
azureedge.net
cloudfront.net
s3.amazonaws.com
elasticbeanstalk.com
*.compute.amazonaws.com
*.compute-1.amazonaws.com
*.elb.amazonaws.com
digitaloceanspaces.com
ondigitalocean.app
myshopify.com
streamlit.app
hf.space
ngrok.io
ngrok-free.app
bubbleapps.io
// dynamic dns
duckdns.org
dyndns.org
no-ip.org
no-ip.net
no-ip.biz
hopto.org
zapto.org
ddns.net
// russia legacy second-levels
com.ru
net.ru
org.ru
msk.ru
spb.ru
"""

PSL_TEXT = _ICANN + "\n" + _US + "\n" + _PRIVATE
